"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of SUDOKN/data-ETL-pipeline, re-expressed Spark-first.

Layout:
  session    - SparkSession factory tuned for local[N] and cluster scale
  tables     - parquet table loading / temp-view registration
  functions/ - portable scalar expression helpers (hashing, text, json)
  operators/ - dedup, similarity, chunking, vocab-search, text-stats ops
  sources/   - JSONL bin-packing writer/reader, CSV helpers
  plans/     - the declared query registry (Spark impl + DuckDB oracle SQL)
  streaming/ - Structured Streaming wrappers over the events table
"""

__version__ = "0.1.0"
