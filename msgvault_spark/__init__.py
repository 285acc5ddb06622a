"""msgvault_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wesm/msgvault, rebuilt Spark-first.

Subpackages:
  session    — SparkSession factory tuned for the analytics workload
  sources    — parquet readers/writers, schema canonicalization, view registry
  plans      — the logical IR (ViewType / AggregateOptions / MessageFilter)
               and its DataFrame compilation (aggregates, listing, stats)
  search     — Gmail-style query parser, metadata fast-search, BM25 FTS,
               vector KNN, hybrid RRF fusion
  dedup      — exact / content-hash / MinHash-LSH / SimHash dedup pipelines
  textstats  — language-ID, quality scoring, token counting, fingerprinting
  similarity — brute-force and LSH-bucketed approximate nearest neighbor
  multimodal — binary-column plumbing (decode stubs, typed metadata)
  streaming  — incremental watermark ETL; Structured Streaming variants
"""

__version__ = "0.1.0"
