"""Source/sink surface (SURVEY.md §2.3 scans/sinks rows): csv and json
readers with explicit schemas, partitioned + plain parquet writes, and
read-back equality."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from fraud_detetion_with__kafkastreams_and_grafana_spark.sources import load_table

ROWS = [
    ("user_001", 10500.5, 1700000001),
    ("user_002", 9999.0, 1700000002),
    ("user_003", 10000.01, 1700000004),
]
SCHEMA = "userId STRING, amount DOUBLE, timestamp LONG"


def test_json_reader_roundtrip(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "j")
        df.write.json(path)
        back = spark.read.schema(SCHEMA).json(path)
        assert sorted(back.collect()) == sorted(df.collect())


def test_csv_reader_roundtrip(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c")
        df.write.option("header", True).csv(path)
        back = spark.read.schema(SCHEMA).option("header", True).csv(path)
        assert sorted(back.collect()) == sorted(df.collect())


def test_csv_corrupt_rows_dropped(spark):
    """DROPMALFORMED mirrors the topology's drop-on-parse-error contract at
    the source layer."""
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "c")
        os.makedirs(path)
        with open(os.path.join(path, "p.csv"), "w") as f:
            f.write("user_001,10500.5,1700000001\nGARBAGE_LINE_ONLY_ONE_COL\n")
        back = (
            spark.read.schema(SCHEMA).option("mode", "DROPMALFORMED").csv(path)
        ).collect()
        assert len(back) == 1 and back[0].userId == "user_001"


def test_partitioned_parquet_sink(spark, sf_dir):
    """Hive-style partitioned write (the scale layout for the fraud sink
    table): partition dirs exist, read-back with partition pruning matches."""
    events = load_table(spark, sf_dir, "events").limit(200)
    df = events.withColumn("day", F.to_date("ts"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "p")
        df.write.partitionBy("day").parquet(path)
        assert any(e.startswith("day=") for e in os.listdir(path))
        back = spark.read.parquet(path)
        one_day = [r.day for r in back.select("day").distinct().limit(1).collect()][0]
        pruned = back.filter(F.col("day") == F.lit(one_day))
        expect = df.filter(F.col("day") == F.lit(one_day))
        assert pruned.count() == expect.count() > 0


def test_r53_prunes_partitions(spark, sf_dir):
    """r53's scan must resolve the week filter at planning time: the
    parquet scan node lists the range under PartitionFilters (directory
    pruning), not as a post-scan Filter over all dates."""
    import io
    from contextlib import redirect_stdout

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import (
        relational3 as R3,
    )

    df = R3.QUERIES["r53_partition_pruning"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    scan = next(
        s for s in plan.split("\n\n") if "Scan parquet" in s and "event_date" in s
    )
    pf = next(ln for ln in scan.splitlines() if ln.startswith("PartitionFilters"))
    assert "event_date" in pf and ">=" in pf and "<=" in pf, pf


def test_python_datasource_partition_invariant(spark):
    """r56's source: the generated table is a pure function of row id —
    identical rows for any partitioning (retry/exactly-once safety), and
    the requested parallelism is honored."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.pydatasource import (
        register,
    )

    register(spark)

    def rows(parts):
        df = (
            spark.read.format("synthetic_tx")
            .option("rows", 1000)
            .option("partitions", parts)
            .load()
        )
        assert df.rdd.getNumPartitions() == parts
        return sorted(map(tuple, df.collect()))

    a, b = rows(3), rows(8)
    assert a == b and len(a) == 1000
    amounts = [r[2] for r in a]
    assert all(1000.0 <= x < 11000.0 for x in amounts)
