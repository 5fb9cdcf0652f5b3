"""edinet_etl_spark — a PySpark-native analytics engine.

Re-expresses the data model and operator inventory of the reference
pandas ETL pipeline (``reza-abdi7/edinet-etl``, surveyed exhaustively in
SURVEY.md §2) as idiomatic Spark DataFrame/SQL, and extends it with the
aggregation/window/set-op surface, event-time windowing, and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
- ``session``    — tuned SparkSession builder (AQE, Arrow, UTC).
- ``tables``     — explicit-schema loaders for the test tables.
- ``registry``   — the query/oracle registry behind ``__spark_entry__``.
- ``operators/`` — the query surface (relational, reference-parity,
                   analytics, events, dedup, similarity, text, multimodal).
- ``sources/``   — ingestion primitives (cp932 CSV, UTF-16 TSV, ZIP
                   member UDTF, XBRL parse UDTF, rate-limited REST fetch).
- ``pipeline/``  — the reference ETL re-expressed end-to-end on Spark.
- ``streaming/`` — Structured Streaming jobs over the events feed.
"""

__version__ = "0.1.0"
