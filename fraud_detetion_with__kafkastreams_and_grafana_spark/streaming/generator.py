"""Streaming synthetic transaction source — the reference's producer (R1)
re-expressed on Spark's rate source.

Reference semantics (TransactionProducer.java:25-51): 1 record/second,
userId = 'user_%03d' uniform over 200 users, amount ~ U[1000, 11000),
timestamp = epoch seconds. Here the rate source provides (timestamp,
value); deterministic column expressions derive the fields — tune
rowsPerSecond freely (the reference's 1 rps is a demo constant, not a
capability limit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NUM_USERS = 200
AMOUNT_LO = 1_000.0
AMOUNT_SPAN = 10_000.0


def transaction_columns(df: DataFrame, seed: int = 42) -> DataFrame:
    """Map a rate-source (timestamp, value) stream to transaction rows.

    userId is derived from a hash of the monotonic value (uniform over
    NUM_USERS); amount from a second hash scaled into [1000, 11000) —
    deterministic given the rate-source values, unlike rand() which is
    re-evaluated per task retry.
    """
    h1 = F.pmod(F.xxhash64(F.col("value"), F.lit(seed)), F.lit(NUM_USERS))
    h2 = F.pmod(F.xxhash64(F.col("value"), F.lit(seed + 1)), F.lit(1_000_000))
    return df.select(
        F.format_string("user_%03d", h1.cast("int")).alias("userId"),
        (F.lit(AMOUNT_LO) + h2.cast("double") / 1_000_000.0 * F.lit(AMOUNT_SPAN)).alias(
            "amount"
        ),
        F.unix_timestamp("timestamp").alias("timestamp"),  # epoch seconds (R1)
    )


def rate_transactions(
    spark: SparkSession, rows_per_second: int = 1000, seed: int = 42
) -> DataFrame:
    """Unbounded transaction stream (streaming DataFrame)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return transaction_columns(rate, seed)


def batch_transactions(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Bounded analog of the same generator for batch-stream parity tests:
    spark.range + identical column derivations."""
    df = spark.range(n).select(
        F.col("id").alias("value"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("timestamp"),
    )
    return transaction_columns(df, seed)
