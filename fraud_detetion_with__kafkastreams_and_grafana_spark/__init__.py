"""PySpark-native analytics engine with the capabilities of the reference
fraud-detection pipeline (KHADIJAFD/Fraud-detetion-with--KafkaStreams-and-Grafana).

The reference is a Kafka Streams ETL topology (source -> JSON parse ->
null-filter -> amount>threshold branch -> sink) plus Grafana/InfluxDB
dashboard queries (top-k by user, global stats, latest-N, windowed
aggregation). This package re-expresses that surface — and a full
relational + LLM-data-pipeline operator set — as idiomatic Spark
DataFrame / SQL / Structured Streaming plans, letting Catalyst + AQE pick
physical strategies.

Layout:
  session.py    SparkSession factory (AQE, UTC, tuned shuffle partitions)
  schemas.py    explicit StructTypes for the wire format + star schema
  sources/      batch & streaming sources (parquet tables, rate generator,
                JSON wire decode)
  operators/    fraud detect/branch, dedup (exact/minhash/simhash), similarity
                search, as-of join, multimodal stubs
  functions/    reusable column expressions (text stats, vector math)
  plans/        registered analytic queries (dashboard Q1-Q5, relational
                surface, LLM-pipeline queries) — each (spark, sf_dir) -> DataFrame
  streaming/    Structured Streaming variants (generator, topology, windows)
"""

__version__ = "0.1.0"
