"""komodo_data_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
gelic-idealab/komodo-data (reference at /root/reference, studied read-only),
re-expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, columnar
Parquet storage partitioned for 100 TB scale, Structured Streaming for the
ingest loop, and an extension surface of LLM-data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Layout:
    session.py    SparkSession factory (UTC, Arrow, AQE)
    schemas.py    explicit StructTypes for the reference data model
    functions/    scalar helpers: MySQL-compatible JSON access, text, vectors
    operators/    the reference's 5 analytics + TPC-H-ish pack + extensions
    sources/      capture-file ingest, control tables, test-table loaders
    streaming/    Structured Streaming ingest + request dispatcher
    multimodal/   binary-payload column plumbing (decode stubbed)
"""

__version__ = "0.1.0"
