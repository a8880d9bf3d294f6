"""PySpark-native analytics engine with the capabilities of
samuelandrehjr/data-engineering-etl-demo.

The reference (read-only at /root/reference) is a pandas + SQLite batch ETL
warehouse: ingest(validate+quarantine) -> transform(normalize/dedup/derive/
join) -> star-schema upsert -> 5 analytics SQL queries + CSV exports +
quality report.  This package re-expresses every operator Spark-first
(DataFrame / Spark SQL / Catalyst), designed for a 1000-executor cluster on
~100 TB even though it is tested on local[32].

Layout (SURVEY.md section 7):
    session.py      SparkSession builder (UTC, AQE, shuffle partitions)
    schemas.py      StructType contracts for every source/warehouse table
    functions/      column-expression libraries (cleaning, hashing, text)
    sources/        readers with quarantine split + sinks (S1-S11)
    operators/      transform, warehouse, dedup, similarity, text, multimodal
    plans/          analytics query plans (DataFrame + SQL pairs)
    streaming/      Structured Streaming variant of ingest+dedup
"""

__version__ = "0.1.0"
