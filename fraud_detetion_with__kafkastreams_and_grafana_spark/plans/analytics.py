"""Dashboard analytic queries Q1-Q5 (SURVEY.md §2.2).

These are the queries the reference's Grafana/InfluxDB dashboards run over
the fraud-alert sink table (README.md:342-356, screenshots/*.jpg) — the
engine absorbs that query layer as first-class DataFrame plans.

The driver's `events` table plays the transactions stream: user_id ->
userId, value -> amount, ts -> event_time, with the strict-`>` fraud
threshold parameterized to the events value distribution (~10%
selectivity, like the reference's U[1000,11000) vs >10000 —
TransactionProducer.java:48, TransactionProcessor.java:15,39).

Physical notes (verified via .explain):
- Q1/Q2/Q5: partial+final hash aggregate; the value>threshold predicate is
  pushed to the parquet scan (PushedFilters) and only referenced columns
  are read (ReadSchema).
- Q1/Q3: orderBy+limit compiles to TakeOrderedAndProject — no global sort
  at any scale.
- Q4: single shuffle on (window, userId); at 100 TB this is the only
  shuffle in the pipeline and AQE coalesces its output partitions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.detect import EVENTS_FRAUD_THRESHOLD, branch_fraud, events_as_transactions
from ..sources.tables import load_table

Query = Callable[[SparkSession, str], DataFrame]


def fraud_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fraud branch of the topology over the events table: the engine's
    analog of the reference's `fraud-alerts` sink table."""
    tx = events_as_transactions(load_table(spark, sf_dir, "events"))
    fraud, _rest = branch_fraud(tx, threshold=EVENTS_FRAUD_THRESHOLD)
    return fraud


# SQL fragment shared by every oracle: the fraud branch in DuckDB terms.
_FRAUD_SQL = (
    "SELECT printf('user_%03d', user_id) AS userId, value AS amount, "
    "date_trunc('second', ts) AS event_time, "
    "event_id, event_type, props FROM events WHERE value > 100.0"
)


def q1_top10_scammers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 users by total fraud amount (screenshots/top10scammers.jpg).

    groupBy -> sum -> orderBy desc -> limit 10; Spark plans this as
    hash-agg + TakeOrderedAndProject (top-k per partition, merge on
    driver) — no global sort, scales to any key cardinality.
    """
    return (
        fraud_alerts(spark, sf_dir)
        .groupBy("userId")
        .agg(F.sum("amount").alias("_total"), F.count("*").alias("n_tx"))
        .orderBy(F.desc("_total"), F.asc("userId"))
        .limit(10)
        .select("userId", F.round("_total", 2).alias("total_amount"), "n_tx")
    )


Q1_SQL = f"""
SELECT userId, round(total, 2) AS total_amount, n_tx
FROM (
  SELECT userId, sum(amount) AS total, count(*) AS n_tx
  FROM ({_FRAUD_SQL}) GROUP BY userId
  ORDER BY total DESC, userId ASC LIMIT 10
)
"""


def q2_global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-time stat tiles: min / max / total / count over fraud alerts
    (screenshots/top10scammers.jpg tiles). Grouping-free partial+final agg:
    one scalar per executor partition, merged on the driver."""
    return fraud_alerts(spark, sf_dir).agg(
        F.round(F.min("amount"), 2).alias("min_amount"),
        F.round(F.max("amount"), 2).alias("max_amount"),
        F.round(F.sum("amount"), 2).alias("total_amount"),
        F.count("*").alias("n_tx"),
    )


Q2_SQL = f"""
SELECT round(min(amount), 2) AS min_amount, round(max(amount), 2) AS max_amount,
       round(sum(amount), 2) AS total_amount, count(*) AS n_tx
FROM ({_FRAUD_SQL})
"""


def q3_latest_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-N fraud transactions table (screenshots/top10scammers.jpg,
    'Lastest Fraud Transacations'): newest first; event_id tie-break pins
    second-precision timestamp collisions (FIXTURES.md §1)."""
    return (
        fraud_alerts(spark, sf_dir)
        .orderBy(F.desc("event_time"), F.desc("event_id"))
        .limit(20)
        .select("event_time", "amount", "userId", "event_id")
    )


Q3_SQL = f"""
SELECT event_time, amount, userId, event_id
FROM ({_FRAUD_SQL})
ORDER BY event_time DESC, event_id DESC LIMIT 20
"""


def q4_windowed_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window amount histogram per user
    (screenshots/AmountHistogram.jpg: 10 s windows over 'Past 15m'; scaled
    here to 10 min over the testdata's one-month span). Spark `window()`
    buckets are epoch-aligned; the oracle floors epoch seconds to match."""
    return (
        fraud_alerts(spark, sf_dir)
        .groupBy(F.window("event_time", "10 minutes").alias("w"), F.col("userId"))
        .agg(F.sum("amount").alias("_total"), F.count("*").alias("n_tx"))
        .select(
            F.col("w.start").alias("window_start"),
            "userId",
            F.round("_total", 2).alias("total_amount"),
            "n_tx",
        )
    )


Q4_SQL = f"""
SELECT CAST(to_timestamp(floor(epoch(event_time) / 600) * 600) AS TIMESTAMP) AS window_start,
       userId, round(sum(amount), 2) AS total_amount, count(*) AS n_tx
FROM ({_FRAUD_SQL})
GROUP BY 1, 2
"""


def q5_range_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range scan + per-key mean (screenshots/raudTable.jpg: data
    explorer over [_start,_stop) grouped on userId with mean aggregate).
    The range predicate is applied on the raw stored ts column (int64
    nanos or TIMESTAMP(MICROS), whichever layout the table ships in) so it
    pushes into the parquet scan (row-group min/max pruning — at 100 TB
    this is the partition-pruning path; verified in PushedFilters)."""
    import calendar
    from datetime import datetime

    def ns(s: str) -> int:
        return calendar.timegm(datetime.fromisoformat(s).timetuple()) * 1_000_000_000

    events = load_table(
        spark,
        sf_dir,
        "events",
        ts_range_ns=(ns("2024-01-08 00:00:00"), ns("2024-01-22 00:00:00")),
    )
    tx = events_as_transactions(events)
    fraud, _ = branch_fraud(tx, threshold=EVENTS_FRAUD_THRESHOLD)
    return fraud.groupBy("userId").agg(
        F.round(F.avg("amount"), 4).alias("mean_amount"), F.count("*").alias("n_tx")
    )


Q5_SQL = f"""
SELECT userId, round(avg(amount), 4) AS mean_amount, count(*) AS n_tx
FROM ({_FRAUD_SQL})
WHERE event_time >= TIMESTAMP '2024-01-08 00:00:00'
  AND event_time <  TIMESTAMP '2024-01-22 00:00:00'
GROUP BY userId
"""


def q6_wire_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2-R8 parity: serialize events to the JSON wire format
    (TransactionProducer.java:27), parse back with from_json
    (null-on-corrupt), fraud-filter, aggregate. The roundtrip is the
    identity on well-formed data, so the oracle runs on events directly —
    this pins the parse path end-to-end against the same answer."""
    from ..operators.detect import parse_wire
    from ..schemas import TRANSACTION_DDL  # noqa: F401  (documented contract)

    tx = events_as_transactions(load_table(spark, sf_dir, "events"))
    wire = tx.select(
        F.to_json(
            F.struct(
                F.col("userId"),
                F.col("amount"),
                F.unix_timestamp(F.col("event_time").cast("timestamp")).alias("timestamp"),
            )
        ).alias("value")
    )
    parsed = parse_wire(wire)
    fraud = parsed.filter(F.col("amount") > EVENTS_FRAUD_THRESHOLD)
    return fraud.groupBy("userId").agg(
        F.round(F.sum("amount"), 2).alias("total_amount"), F.count("*").alias("n_tx")
    )


Q6_SQL = """
SELECT printf('user_%03d', user_id) AS userId, round(sum(value), 2) AS total_amount,
       count(*) AS n_tx
FROM events WHERE value > 100.0
GROUP BY 1
"""


def q7_fraud_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14 parity: the consumer's InfluxDB point shape
    (FraudAlertConsumer.java:64-67) as a result set — measurement 'fraud'
    ≅ this table, tag userId, field amount, event time truncated to
    seconds (WritePrecision.S). Narrow ops only: the filter pushes to the
    parquet scan and no shuffle occurs at any scale."""
    tx = events_as_transactions(load_table(spark, sf_dir, "events"))
    return tx.filter(F.col("amount") > EVENTS_FRAUD_THRESHOLD).select(
        "event_time", "userId", "amount"
    )


Q7_SQL = """
SELECT date_trunc('second', ts) AS event_time,
       printf('user_%03d', user_id) AS userId, value AS amount
FROM events WHERE value > 100.0
"""


def q8_alert_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grafana-style ALERT RULE evaluation ("condition true FOR >= N
    evaluation windows"): per user, bucket fraud activity into 12 h
    windows and fire one alert row per maximal run of >= 2 consecutive
    breaching windows, with the firing interval, run length, and peak
    window total — the alerting half of the reference's dashboard layer
    (the screenshots' Grafana stack evaluates exactly this shape), and
    the classic gaps-and-islands pattern (island id = window index minus
    per-user row_number, so consecutive windows share an island).

    Scale: one (userId, window) hash aggregate over the pushed-down
    fraud scan, then a per-user window function over <= |windows-per-
    user| rows (tiny, partitioned by user — no global sort), then one
    more small aggregate. The 100 TB cost is the first aggregate; the
    alerting logic runs on the rollup."""
    from pyspark.sql.window import Window

    alerts = fraud_alerts(spark, sf_dir)
    widx = F.floor(
        F.unix_timestamp(F.col("event_time").cast("timestamp")) / F.lit(43200)
    ).cast("long")
    # Sum exact integer cents (round(amount*100) per event, cast long)
    # rather than rounding a double sum: a double's last ulp depends on
    # accumulation order, so the rounded total could flake across
    # partitionings; the integer sum is order-independent (m07's
    # risk_micros pattern).
    per_win = (
        alerts.groupBy("userId", widx.alias("widx"))
        .agg(
            F.sum(F.round(F.col("amount") * 100, 0).cast("long")).alias("cents"),
            F.count("*").alias("n_tx"),
        )
        .withColumn("total", F.col("cents") / F.lit(100.0))
    )
    grp = F.col("widx") - F.row_number().over(
        Window.partitionBy("userId").orderBy("widx")
    )
    runs = (
        per_win.withColumn("grp", grp)
        .groupBy("userId", "grp")
        .agg(
            F.count("*").alias("n_windows"),
            F.timestamp_seconds(F.min("widx") * 43200)
            .cast("timestamp_ntz")
            .alias("alert_start"),
            F.timestamp_seconds((F.max("widx") + 1) * 43200)
            .cast("timestamp_ntz")
            .alias("alert_end"),
            F.max("total").alias("peak_total"),
            F.sum("n_tx").alias("n_tx"),
        )
        .where(F.col("n_windows") >= 2)
    )
    return runs.select(
        "userId", "alert_start", "alert_end", "n_windows", "peak_total", "n_tx"
    )


Q8_SQL = f"""
WITH w AS (
  SELECT userId,
         CAST(floor(epoch(event_time) / 43200) AS BIGINT) AS widx,
         sum(CAST(round(amount * 100, 0) AS BIGINT)) / 100.0 AS total,
         count(*) AS n_tx
  FROM ({_FRAUD_SQL})
  GROUP BY 1, 2
), isl AS (
  SELECT *, widx - row_number() OVER (PARTITION BY userId ORDER BY widx) AS grp
  FROM w
)
SELECT userId,
       CAST(to_timestamp(min(widx) * 43200) AS TIMESTAMP) AS alert_start,
       CAST(to_timestamp((max(widx) + 1) * 43200) AS TIMESTAMP) AS alert_end,
       CAST(count(*) AS BIGINT) AS n_windows,
       max(total) AS peak_total,
       CAST(sum(n_tx) AS BIGINT) AS n_tx
FROM isl
GROUP BY userId, grp
HAVING count(*) >= 2
"""


QUERIES: dict[str, Query] = {
    "q1_top10_scammers": q1_top10_scammers,
    "q2_global_stats": q2_global_stats,
    "q3_latest_alerts": q3_latest_alerts,
    "q4_windowed_amounts": q4_windowed_amounts,
    "q5_range_mean": q5_range_mean,
    "q6_wire_roundtrip": q6_wire_roundtrip,
    "q7_fraud_points": q7_fraud_points,
    "q8_alert_periods": q8_alert_periods,
}

ORACLES: dict[str, str] = {
    "q1_top10_scammers": Q1_SQL,
    "q2_global_stats": Q2_SQL,
    "q3_latest_alerts": Q3_SQL,
    "q4_windowed_amounts": Q4_SQL,
    "q5_range_mean": Q5_SQL,
    "q6_wire_roundtrip": Q6_SQL,
    "q7_fraud_points": Q7_SQL,
    "q8_alert_periods": Q8_SQL,
}
