"""PySpark-native analytics engine with the query/data-processing
capabilities of the EbEmad/Click-Streaming-Data-Pipeline reference
(see SURVEY.md), re-expressed Spark-first: DataFrame/SQL for batch,
Structured Streaming for streams, plus LLM-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Layout
------
- ``session``    SparkSession builder tuned for local[32] dev and
                 cluster-scale defaults (AQE, broadcast, Arrow).
- ``sources``    Table loaders (parquet w/ nanos-timestamp handling),
                 CDC envelope synthesis + parsing.
- ``functions``  Scalar function library (SURVEY.md section 2 G),
                 deterministic quality scorer (section 2 H), text
                 analytics.
- ``operators``  Relational operator library (sections 2 B-E), search
                 scoring (section 2 F), upsert/last-write-wins.
- ``streaming``  Structured Streaming pipelines (section 2 A, I).
- ``extensions`` Dedup / similarity / multimodal beyond-reference ops.
- ``plans``      The query catalog: named queries + DuckDB oracle SQL
                 consumed by ``__spark_entry__.py`` and ``bench.py``.
"""

__version__ = "0.1.0"
