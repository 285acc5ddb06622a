from msgvault_spark.sources.loader import (  # noqa: F401
    TESTDATA_TABLES,
    load_table,
    load_testdata,
    register_views,
)
