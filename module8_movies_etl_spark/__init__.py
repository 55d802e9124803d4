"""module8_movies_etl_spark — a PySpark-native analytics engine.

A from-scratch Spark DataFrame engine providing the query and
data-processing capabilities of the Movies-ETL reference pipeline
(Alyssa-CG/Module8-Movies-ETL, surveyed in SURVEY.md): semi-structured
ingestion, regex-driven extraction (currency / multi-format dates /
durations), casts and conditional conflict resolution, dedup, suffixed
equi-joins, grouped aggregation, pivot, profiling — plus the
LLM-data-pipeline extensions (exact/fuzzy dedup, similarity search,
text analysis, multimodal columns), all expressed as lazy Catalyst
plans over Parquet and designed for 1000-executor / 100 TB scale.

Layout
------
- ``session``    SparkSession factory (AQE, UTC, Arrow, sane shuffles)
- ``sources``    readers / writers (Parquet / CSV / JSON / JDBC)
- ``functions``  scalar column-expression library (SURVEY §2.6-2.7)
- ``operators``  relational + LLM-pipeline operators (SURVEY §2.2-2.5, §2.13)
- ``plans``      composed pipelines (the reference ETL as one lazy DAG)
- ``streaming``  Structured Streaming slices (beyond-reference)
"""

__version__ = "0.1.0"
