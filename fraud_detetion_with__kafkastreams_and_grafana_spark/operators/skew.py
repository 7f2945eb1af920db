"""Skew-mitigation helpers: salted aggregation and salted broadcast-side
replication — for when one key carries a disproportionate share of rows
(the classic power-law user) and AQE's skew-join splitting isn't enough
or the op is an aggregation (AQE only splits joins).

Salted two-phase aggregation: groupBy(key, salt) partial-aggregates the
hot key across `salt_buckets` reducers, then a second tiny groupBy(key)
merges the partials. Works for any algebraic aggregate (sum/count/min/
max); here exposed for sum+count (avg = sum/count at merge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: returns (key..., sum_value, n_rows).

    Phase 1 shuffles on (key, salt) — the hot key spreads over
    `salt_buckets` partitions; phase 2 shuffles only the tiny partial
    table. Identical result to a direct groupBy(key).

    The salt is derived from row CONTENT (hash of key+value), never from
    monotonically_increasing_id(): a content hash is stable when a map
    stage is retried, so a recomputed partition lands its rows in the same
    salt buckets and partials are never double- or under-counted. An
    id-based salt can reassign rows on retry — silent wrong answers on a
    real cluster.
    """
    salt = F.pmod(F.xxhash64(*key_cols, value_col), F.lit(salt_buckets))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(value_col).alias("_psum"), F.count("*").alias("_pcnt"))
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("_psum").alias("sum_value"), F.sum("_pcnt").alias("n_rows")
    )


def replicate_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Salted join for a skewed fact key against a small dim: the fact side
    gets a random salt, the dim side is replicated across all salt values,
    and the join key becomes (key, salt) — the hot key's rows spread over
    `salt_buckets` tasks. With a broadcastable dim, prefer plain
    broadcast(); this shape is for when the dim is just over the broadcast
    threshold but the fact key is pathologically skewed.

    Salt is a content hash of the whole fact row (retry-deterministic, see
    salted_sum_count); identical rows sharing a bucket is fine — the goal
    is spreading the hot KEY, and any key with many distinct rows spreads.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_buckets))
    )
    salted_dim = dim.crossJoin(
        F.broadcast(
            fact.sparkSession.range(salt_buckets).select(F.col("id").alias("_salt"))
        )
    )
    return salted_fact.join(salted_dim, [key, "_salt"]).drop("_salt")
