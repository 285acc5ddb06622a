from msgvault_spark.plans.models import (  # noqa: F401
    AggregateOptions,
    MessageFilter,
    MessageSort,
    Pagination,
    SortDirection,
    SortField,
    TimeGranularity,
    ViewType,
)
