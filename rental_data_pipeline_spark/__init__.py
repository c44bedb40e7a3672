"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference incremental-ETL pipeline
(klimmm/rental-data-pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : tuned SparkSession builder (AQE, Arrow, UTC).
- ``schema``     : listing union schema, rename map, typed field lists.
- ``functions``  : scalar column-expression library (SURVEY §2.7 X1–X21).
- ``operators``  : DataFrame -> DataFrame ops — flatten/normalize, the
  CDC upsert merge (SURVEY §2.4/§2.6), scope selection, enrichment,
  filters, plus beyond-reference ops (dedup, similarity, text analysis,
  multimodal).
- ``sources``    : testdata loaders, HTML extraction (mapInPandas),
  state-table read/write.
- ``plans``      : the five-step batch pipeline job (SURVEY §3.1).
- ``streaming``  : Structured Streaming variants (foreachBatch upsert).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection, and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"
