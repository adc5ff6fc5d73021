"""bangumi_notion_data_integration_project_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark engine with the query and data-processing
capabilities of the reference ETL pipeline
(VictoriaZhang96913/Bangumi_Notion_Data_Integration_Project), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, AQE for
runtime re-planning, Arrow-vectorized Pandas UDFs only where built-in
operators cannot express the semantics.

Layout:
- ``session``    — SparkSession builder tuned for local[N] and cluster use
- ``catalog``    — parquet table loaders for the star-schema testdata
- ``schemas``    — explicit StructTypes for the Bangumi-shaped payloads
- ``functions``  — column-level helpers (scalar, semi-structured, text, vectors)
- ``operators``  — composite dataflow operators (merge, dedup, similarity, topk, summary)
- ``sources``    — connectors in (paginated REST with replay mode, Bangumi flatten)
- ``sinks``      — connectors out (CSV, Excel, JDBC, row-wise REST)
- ``streaming``  — Structured Streaming restatements (incremental merge, windowed aggs)
"""

__version__ = "0.1.0"
