from msgvault_spark.search.parser import ParsedQuery, parse_query  # noqa: F401
