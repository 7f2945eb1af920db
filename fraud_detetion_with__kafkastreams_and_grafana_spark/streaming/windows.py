"""Streaming windowed aggregation (Q4's streaming form): tumbling
event-time windows with a watermark for late-data bounds.

The reference computes windows only downstream in InfluxDB/Grafana
(screenshots/AmountHistogram.jpg, 10 s tumbling); Kafka Streams itself is
stateless. Here the engine computes them inside the stream — watermarking
is the strict capability superset noted in SURVEY.md §1.4.

State scale: one state row per (window, userId); the watermark expires
state for closed windows, so steady-state memory = windows-in-flight x
active keys, independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_amounts(
    tx: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    time_col: str = "event_time",
) -> DataFrame:
    """Per-user tumbling-window totals (works batch & streaming; streaming
    requires the watermark to bound state and drop late rows)."""
    df = tx
    if tx.isStreaming:
        df = tx.withWatermark(time_col, watermark)
    return (
        df.groupBy(F.window(F.col(time_col), window).alias("w"), F.col("userId"))
        .agg(F.sum("amount").alias("total_amount"), F.count("*").alias("n_tx"))
        .select(
            F.col("w.start").alias("window_start"),
            "userId",
            "total_amount",
            "n_tx",
        )
    )
