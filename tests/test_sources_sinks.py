"""Source/sink surface (SURVEY.md §2.3 scans/sinks rows): csv and json
readers with explicit schemas, partitioned + plain parquet writes, and
read-back equality."""

from __future__ import annotations

import os
import tempfile

import pytest

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


def test_load_table_ts_filter_on_both_layouts(spark, tmp_path):
    """The events time-range pushdown must filter identically whether the
    table ships ts as TIMESTAMP(NANOS)-read-as-long or native
    TIMESTAMP(MICROS) — the driver's testdata has used both layouts
    across rounds, and the micros layout once silently dropped the
    filter (the q5 regression this test pins)."""
    import calendar
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables import (
        load_table,
    )

    def ns(s: str) -> int:
        return calendar.timegm(datetime.fromisoformat(s).timetuple()) * 1_000_000_000

    secs = [ns("2024-01-05 00:00:00"), ns("2024-01-10 12:00:00"),
            ns("2024-01-25 00:00:00")]
    lo, hi = ns("2024-01-08 00:00:00"), ns("2024-01-22 00:00:00")

    for unit, vals in (
        ("ns", secs),
        ("us", [v // 1000 for v in secs]),
    ):
        d = tmp_path / f"layout_{unit}"
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array(vals, pa.timestamp(unit)),
                "user_id": pa.array([0, 1, 2], pa.int64()),
                "event_type": pa.array(["click"] * 3),
                "value": pa.array([10.0, 20.0, 30.0]),
                "props": pa.array(['{"k": 1}'] * 3),
            }
        )
        pq.write_table(table, str(d / "events.parquet"))
        df = load_table(spark, str(d), "events", ts_range_ns=(lo, hi))
        rows = df.collect()
        assert [r.event_id for r in rows] == [2], f"layout {unit}: {rows}"
        assert dict(df.dtypes)["ts"] == "timestamp_ntz", unit


def test_load_table_ts_filter_unaligned_ns_bounds(spark, tmp_path):
    """ns-precision bounds NOT aligned to 1000 must select the identical
    event set on both physical layouts. Floor division on the micros
    layout would (a) admit a microsecond value just below the lower
    bound and (b) drop one just below the upper bound — ceiling division
    on both bounds is the correct half-open window conversion."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables import (
        load_table,
    )

    base_us = 1_700_000_000_000_000  # 2023-11-14T22:13:20 in micros
    us_vals = [base_us - 1, base_us, base_us + 9, base_us + 10]
    # lo sits 500 ns above (base_us - 1): excludes event 1 under nanos
    # semantics; hi sits 500 ns above (base_us + 10): includes event 4.
    lo = (base_us - 1) * 1000 + 500
    hi = (base_us + 10) * 1000 + 500

    for unit, vals in (("ns", [u * 1000 for u in us_vals]), ("us", us_vals)):
        d = tmp_path / f"unaligned_{unit}"
        d.mkdir()
        table = pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(vals, pa.timestamp(unit)),
                "user_id": pa.array([0, 1, 2, 3], pa.int64()),
                "event_type": pa.array(["click"] * 4),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
                "props": pa.array(['{"k": 1}'] * 4),
            }
        )
        pq.write_table(table, str(d / "events.parquet"))
        got = sorted(
            r.event_id
            for r in load_table(spark, str(d), "events", ts_range_ns=(lo, hi)).collect()
        )
        assert got == [2, 3, 4], f"layout {unit}: {got}"


def test_avro_roundtrip_when_package_available(spark, tmp_path):
    """Avro source/sink round-trip — jar-gated like the Kafka path: the
    spark-avro module is external since Spark 2.4, so this skips cleanly
    where the package isn't deployed and pins the write/read fidelity
    where it is."""
    df = spark.range(100).selectExpr(
        "id", "printf('user_%03d', id % 200) AS userId", "id * 1.5 AS amount"
    )
    try:
        df.write.format("avro").mode("overwrite").save(str(tmp_path / "avro"))
    except Exception as e:
        if "Failed to find data source" in str(e) or "AVRO" in str(e).upper():
            pytest.skip("spark-avro package not deployed")
        raise
    back = spark.read.format("avro").load(str(tmp_path / "avro"))
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
