"""Arrow-vectorized Python UDF surface — the sanctioned escape hatch when
built-ins genuinely can't express the semantics (SURVEY.md §2.3 UDF row).

Two patterns:
- `@pandas_udf` scalar: batch-vectorized column function (Arrow transfer,
  ~10-100x over row-at-a-time Python UDFs). Demonstrated with a fraud-risk
  score whose closed form is also SQL-expressible, so the oracle can check
  the whole Arrow path end-to-end.
- `applyInPandas` grouped map: per-group pandas transform (the batch twin
  of applyInPandasWithState). Demonstrated with per-user z-score
  normalization, oracle-checked against window-function SQL.

Scale: both stream Arrow record batches executor-side; no driver
collection. applyInPandas shuffles once on the grouping key and each
group must fit in one worker's memory — fine for per-user groups, wrong
for whole-table groups (use window functions then).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


# DataType object, not a DDL string: string return types are parsed via the
# active SparkSession, which doesn't exist yet at module import time.
@pandas_udf(DoubleType())
def fraud_risk_score(amount: pd.Series, threshold: pd.Series) -> pd.Series:
    """Vectorized risk score in [0,1]: sigmoid-free closed form
    min(1, max(0, (amount/threshold - 0.5) / 1.0)). Deterministic, so the
    SQL oracle can replay it exactly."""
    x = amount / threshold - 0.5
    return x.clip(lower=0.0, upper=1.0)


def with_risk_score(df: DataFrame, threshold: float, amount_col: str = "amount") -> DataFrame:
    return df.withColumn(
        "risk_score",
        F.round(fraud_risk_score(F.col(amount_col), F.lit(float(threshold))), 6),
    )


ZSCORE_SCHEMA = (
    "userId STRING, event_id LONG, amount DOUBLE, amount_z DOUBLE"
)


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    mu = pdf["amount"].mean()
    sd = pdf["amount"].std(ddof=1)  # sample stddev, matches stddev_samp
    z = (pdf["amount"] - mu) / sd if sd and sd > 0 else pdf["amount"] * 0.0
    return pd.DataFrame(
        {
            "userId": pdf["userId"],
            "event_id": pdf["event_id"],
            "amount": pdf["amount"],
            "amount_z": z,
        }
    )


@pandas_udf(DoubleType())
def amount_weighted_mean(amount: pd.Series) -> float:  # grouped-agg UDAF
    """Self-weighted mean sum(a^2)/sum(a): a custom aggregate the built-in
    surface lacks, exercised as a pandas GROUPED_AGG (one value per group,
    Arrow-batched). Caveat (verified on the plan): unlike JVM aggregates,
    pandas GROUPED_AGG shuffles RAW rows to one reducer per key — no
    partial/final split — so a hot key concentrates on one task. For
    skewed keys prefer the closed-form SQL (partial-aggregating) or the
    salted two-phase pattern (operators/skew.py)."""
    s = float(amount.sum())
    return float((amount * amount).sum()) / s if s else 0.0


# Partial aggregates for the SALTED two-phase pandas UDAF: pandas
# GROUPED_AGG has no JVM partial/final split, so the skew-safe form makes
# the split explicit — pandas partials per (key, salt), closed-form merge.
@pandas_udf(DoubleType())
def partial_sum_sq(amount: pd.Series) -> float:
    return float((amount * amount).sum())


@pandas_udf(DoubleType())
def partial_sum(amount: pd.Series) -> float:
    return float(amount.sum())


def partial_weighted_mean(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
) -> DataFrame:
    """Custom UDAF with TRUE map-side combine — the scale-correct form of
    `amount_weighted_mean`, which as a pandas GROUPED_AGG (a) ships every
    raw row to one reducer per key and (b) pays one Arrow round-trip per
    GROUP (salting u05 into (key, salt) groups made it 10x SLOWER locally:
    16x the per-group overhead).

    Phase 1: mapInPandas computes (sum v^2, sum v) per key WITHIN each
    input partition — one Arrow batch per partition, zero shuffle of raw
    rows, exactly like the JVM's partial aggregation. Phase 2: a JVM
    groupBy(key) merges n_partitions x n_keys partial rows in closed form
    sum(v^2)/sum(v). Skew-immune by construction — a hot key contributes
    one partial per partition it appears in, never a concentrated task."""
    from pyspark.sql import types as T

    key_fields = df.select(*key_cols).schema.fields
    out_schema = T.StructType(
        [
            *key_fields,
            T.StructField("_p2", T.DoubleType()),
            T.StructField("_p1", T.DoubleType()),
        ]
    )

    def partials(batches):
        for pdf in batches:
            v = pdf[value_col]
            g = (
                pdf.assign(_sq=v * v)
                .groupby(list(key_cols), as_index=False, sort=False)
                .agg(_p2=("_sq", "sum"), _p1=(value_col, "sum"))
            )
            yield g

    partial = df.select(*key_cols, value_col).mapInPandas(partials, out_schema)
    return partial.groupBy(*key_cols).agg(
        (F.sum("_p2") / F.sum("_p1")).alias("wmean")
    )


def salted_weighted_mean(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted twin of `amount_weighted_mean`: identical result, with the
    hot key's raw rows spread over `salt_buckets` reducers.

    Phase 1 shuffles raw rows on (key, salt) — bounded rows per task even
    for a power-law key — and computes pandas partials sum(a^2), sum(a);
    phase 2 shuffles only the tiny partial table and merges in closed form
    sum(a^2)/sum(a). Salt is a content hash (retry-deterministic, same
    rationale as operators/skew.salted_sum_count).

    Note: prefer `partial_weighted_mean` — GROUPED_AGG pays one Arrow
    round-trip per group, so multiplying groups by salt_buckets multiplies
    that overhead; the mapInPandas partial form avoids the raw-row shuffle
    entirely. This one is kept as the general salting pattern for operators
    that genuinely need whole-group data per call."""
    salt = F.pmod(F.xxhash64(*key_cols, value_col), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            partial_sum_sq(value_col).alias("_p2"),
            partial_sum(value_col).alias("_p1"),
        )
    )
    return partial.groupBy(*key_cols).agg(
        (F.sum("_p2") / F.sum("_p1")).alias("wmean")
    )


def shingle_rows(text: str):
    """Row-generator logic for the UDTF below: (pos, tok) per whitespace
    token. ASCII-\\s+ splitting (re.ASCII) so the boundaries match the
    Java/RE2 \\s+ used by the engine's tokenizer and the DuckDB oracle —
    str.split() would additionally split on unicode whitespace (NBSP)."""
    import re

    stripped = (text or "").strip()
    if not stripped:
        return
    for i, t in enumerate(re.split(r"\s+", stripped, flags=re.ASCII)):
        yield i, t


def make_shingle_udtf():
    """Python UDTF (table function, Spark 4): one input row -> N output
    rows. The lateral-join shape built-ins can't express when the
    expansion logic is imperative. Constructed lazily — the udtf decorator
    parses its DDL return type via the active session. useArrow batches
    the rows over Arrow instead of pickling one at a time (the plan shows
    ArrowEvalPythonUDTF, not BatchEvalPythonUDTF)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string", useArrow=True)
    class ShingleUDTF:
        def eval(self, text: str):
            yield from shingle_rows(text)

    return ShingleUDTF


def per_user_zscore(tx: DataFrame) -> DataFrame:
    """Grouped-map normalization: one shuffle on userId, then a pandas
    transform per group (Arrow batches).

    The userId exchange is issued as an EXPLICIT-width repartition
    (session default parallelism) that the grouped-map reuses: AQE's
    partition coalescing sizes post-shuffle partitions for JVM work
    (~1 MB floor) and folded this whole stage onto ONE Python worker at
    bench scale (measured 4.3 s task run at 0.7 s JVM CPU — per-group
    pandas overhead, serialized). An explicit count opts this one
    exchange out of coalescing; group results are per-group functions,
    so partitioning cannot change values. At cluster scale
    defaultParallelism is the executor-core total — the same floor a
    hand-tuned shuffle.partitions would give (guide §2: scale-adaptive,
    not a local constant)."""
    sel = tx.select("userId", "event_id", "amount")
    n = sel.sparkSession.sparkContext.defaultParallelism
    return (
        sel.repartition(n, F.col("userId"))
        .groupBy("userId")
        .applyInPandas(_zscore_group, schema=ZSCORE_SCHEMA)
    )


def make_risk_score_iter(threshold: float):
    """Iterator-form scalar pandas UDF (SCALAR_ITER): the same closed-form
    risk score as `fraud_risk_score`, but the function body runs once per
    PARTITION and streams Arrow batches through — the prologue before the
    loop is where production pipelines hoist per-partition setup (load a
    model / tokenizer / codec once, not once per batch). Same oracle as
    the plain scalar form: the iterator plumbing must be invisible in the
    result."""
    @pandas_udf(DoubleType())
    def risk_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        inv = 1.0 / threshold  # per-partition init slot
        for amount in batches:
            yield (amount * inv - 0.5).clip(lower=0.0, upper=1.0)

    return risk_iter


def arrow_amount_features(tx: DataFrame) -> DataFrame:
    """mapInArrow — the zero-copy end of the Python-interop ladder (plain
    scalar pandas_udf -> SCALAR_ITER -> applyInPandas -> mapInPandas ->
    THIS): batches arrive as pyarrow RecordBatches and all compute runs
    in pyarrow.compute kernels, so no pandas materialization and no
    Python-object boxing ever happens. The shape for per-batch work over
    columnar buffers (codecs, tokenizers with Arrow bindings, FFI).

    Deterministic closed-form features so the SQL oracle replays the
    identical arithmetic: amount_hundreds = floor(amount/100),
    amount_frac = round(amount - floor(amount), 6)."""
    import pyarrow as pa

    def _features(batches):
        import pyarrow.compute as pc

        for b in batches:
            amount = b.column("amount")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("userId"),
                    b.column("event_id"),
                    pc.cast(pc.floor(pc.divide(amount, 100.0)), pa.int64()),
                    pc.round(pc.subtract(amount, pc.floor(amount)), ndigits=6),
                ],
                ["userId", "event_id", "amount_hundreds", "amount_frac"],
            )

    return tx.select("userId", "event_id", "amount").mapInArrow(
        _features,
        "userId string, event_id long, amount_hundreds long, amount_frac double",
    )
