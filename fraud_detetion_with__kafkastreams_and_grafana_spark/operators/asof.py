"""As-of (point-in-time) join — an operator the reference lacks but a
time-series analytics engine needs (SURVEY.md §2.3 joins row).

Spark-first formulation: instead of the naive equi-join + per-left-row
argmax (which explodes |left_key| x |right_key| pairs before aggregating),
we UNION the two sides, window-sort once per key, and carry the most
recent right-side payload forward with ``last(ignorenulls=True)``. One
shuffle on the key, no pair explosion — survives skewed keys and 100 TB
fact tables where the join-then-aggregate version would OOM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when inclusive=False) sharing the
    ``by`` keys. Right-side payload columns come back nullable (null when
    no prior right row exists).

    Ties on (key, ts) between right rows resolve to the lexicographically
    greatest payload struct — deterministic.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_is_right"),
        payload,
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_is_right"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    l_cols = [c for c in left.columns]
    unioned = l.select(
        *[F.col(c) for c in by],
        "_asof_ts",
        "_asof_is_right",
        "_asof_payload",
        F.struct(*[F.col(c) for c in l_cols if c not in by]).alias("_asof_left"),
    ).unionByName(r.withColumn("_asof_left", F.lit(None)), allowMissingColumns=True)

    # At equal ts: right rows sort before left when inclusive (so the left
    # row sees them), after when exclusive.
    right_order = F.desc("_asof_is_right") if inclusive else F.asc("_asof_is_right")
    w = (
        Window.partitionBy(*by)
        .orderBy(F.asc("_asof_ts"), right_order, F.asc("_asof_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_asof_is_right") == 0).select(
        *[F.col(c) for c in by],
        *[F.col(f"_asof_left.{c}").alias(c) for c in l_cols if c not in by],
        *[F.col(f"_asof_match.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
    return out


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the payload of the EARLIEST right row
    with ``right_ts >= left_ts`` (or ``>`` when inclusive=False) sharing
    the ``by`` keys — the forward mirror of asof_join_backward ("next
    quote after the trade"), same single-shuffle union formulation:
    sort each key DESCENDING by time and carry the last non-null
    payload, so the carried value at a left row is the nearest
    following right row. No pair explosion at any scale.

    Ties on (key, ts) between right rows resolve to the
    lexicographically SMALLEST payload struct — deterministic (order
    payload columns so the intended tie-break leads the struct).
    """
    payload = F.struct(*[F.col(c) for c in payload_cols]).alias("_asof_payload")
    r = right.select(
        *[F.col(c) for c in by],
        F.col(right_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_is_right"),
        payload,
    )
    l = left.select(  # noqa: E741
        "*",
        F.col(left_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_is_right"),
        F.lit(None).cast(r.schema["_asof_payload"].dataType).alias("_asof_payload"),
    )
    l_cols = [c for c in left.columns]
    unioned = l.select(
        *[F.col(c) for c in by],
        "_asof_ts",
        "_asof_is_right",
        "_asof_payload",
        F.struct(*[F.col(c) for c in l_cols if c not in by]).alias("_asof_left"),
    ).unionByName(r.withColumn("_asof_left", F.lit(None)), allowMissingColumns=True)

    # Descending time walk. At equal ts: right rows must be traversed
    # BEFORE the left row when inclusive (so the left row sees them);
    # among equal-ts right rows the smallest payload must be traversed
    # LAST (it wins the carry), hence desc payload order.
    right_order = F.desc("_asof_is_right") if inclusive else F.asc("_asof_is_right")
    w = (
        Window.partitionBy(*by)
        .orderBy(F.desc("_asof_ts"), right_order, F.desc("_asof_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_asof_match", F.last("_asof_payload", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_asof_is_right") == 0).select(
        *[F.col(c) for c in by],
        *[F.col(f"_asof_left.{c}").alias(c) for c in l_cols if c not in by],
        *[F.col(f"_asof_match.{c}").alias(f"asof_{c}") for c in payload_cols],
    )
