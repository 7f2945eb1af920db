"""Distributed running (prefix) sums.

A running sum over a corpus-ordered frame is the textbook thing Spark's
window functions get WRONG at scale: `Window.orderBy(x)` with no
partition key funnels every row through one partition. The scalable
lowering is the classic two-level segmented scan: partition rows into
segments, running-sum INSIDE each segment in parallel, then offset each
segment by the running total of all earlier segments — a window over the
|segments|-row totals frame that rides a broadcast join back. Used by
the sweep-line concurrency query (r88, segments = days) and the
systematic weighted sampler (l79, segments = doc_id blocks).

No reference counterpart (the reference has no ordered aggregation at
all); public-algorithm lowering of Blelloch's scan to DataFrame ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def segmented_running_sum(
    df: DataFrame,
    seg_col: str,
    order_col: str,
    val_col: str,
    out_col: str = "run",
) -> DataFrame:
    """Inclusive running sum of `val_col` over the total order
    (seg_col, order_col), computed as the two-level segmented scan.
    (seg_col, order_col) pairs must be unique per row. Adds `out_col`;
    the segment-offset join broadcasts (|segments| rows)."""
    w_in = (
        Window.partitionBy(seg_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = df.withColumn(out_col, F.sum(val_col).over(w_in))
    w_seg = Window.orderBy(seg_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        df.groupBy(seg_col)
        .agg(F.sum(val_col).alias("_seg_total"))
        .withColumn(
            "_seg_offset",
            F.coalesce(F.sum("_seg_total").over(w_seg), F.lit(0)),
        )
        .select(seg_col, "_seg_offset")
    )
    return (
        intra.join(F.broadcast(offsets), seg_col)
        .withColumn(out_col, (F.col(out_col) + F.col("_seg_offset")))
        .drop("_seg_offset")
    )


def partitioned_running_sums(
    df: DataFrame,
    part_col: str,
    seg_col: str,
    order_col: str,
    val_cols: list[str],
    suffix: str = "_run",
) -> DataFrame:
    """`segmented_running_sum` generalized two ways: the scan restarts
    per `part_col` value (independent running sums per partition key,
    all computed in parallel), and several `val_cols` are summed in ONE
    pass over the same order. (part_col, seg_col, order_col) must be
    unique per row; seg_col must be an order-preserving coarsening of
    order_col (e.g. its high bits). Adds `<val><suffix>` per value
    column; the offset frame is |part x seg| rows and rides a
    broadcast. Used by the exact KS drift test (m22), where each
    event_type segment needs its own ECDF scan over the value domain."""
    w_in = (
        Window.partitionBy(part_col, seg_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = df.select(
        "*", *[F.sum(v).over(w_in).alias(v + suffix) for v in val_cols]
    )
    w_seg = Window.partitionBy(part_col).orderBy(seg_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        df.groupBy(part_col, seg_col)
        .agg(*[F.sum(v).alias(f"_t_{v}") for v in val_cols])
        .select(
            part_col,
            seg_col,
            *[
                F.coalesce(F.sum(f"_t_{v}").over(w_seg), F.lit(0)).alias(
                    f"_o_{v}"
                )
                for v in val_cols
            ],
        )
    )
    out = intra.join(F.broadcast(offsets), [part_col, seg_col])
    for v in val_cols:
        out = out.withColumn(v + suffix, F.col(v + suffix) + F.col(f"_o_{v}"))
    return out.drop(*[f"_o_{v}" for v in val_cols])


def segmented_rank(
    df: DataFrame,
    seg_col: str,
    order_cols: list[str],
    out_col: str = "rank",
) -> DataFrame:
    """Global 1-based row_number over the total order (seg_col,
    *order_cols) — the count-offset variant of the segmented scan.
    seg_col MUST be an order-preserving prefix of the primary sort key
    (e.g. its high bits), so intra-segment ranks + earlier-segment
    counts compose into the global rank without a single-partition
    corpus sort. The |segments|-row offset frame rides a broadcast."""
    w_in = Window.partitionBy(seg_col).orderBy(*order_cols)
    intra = df.withColumn(out_col, F.row_number().over(w_in))
    w_seg = Window.orderBy(seg_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        df.groupBy(seg_col)
        .agg(F.count("*").alias("_seg_n"))
        .withColumn(
            "_seg_offset",
            F.coalesce(F.sum("_seg_n").over(w_seg), F.lit(0)),
        )
        .select(seg_col, "_seg_offset")
    )
    return (
        intra.join(F.broadcast(offsets), seg_col)
        .withColumn(out_col, (F.col(out_col) + F.col("_seg_offset")))
        .drop("_seg_offset")
    )
