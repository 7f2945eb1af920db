"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two paths, per the standard ANN playbook:
- brute-force cosine top-k: exact baseline — one scan, one TakeOrdered;
  at 100 TB this is the per-query fallback and the recall yardstick.
- random-hyperplane LSH buckets: signature = sign bits against a fixed
  seeded plane set; candidates share the query's bucket (multi-probe via
  band splits). Sub-linear candidate sets at scale; recall measured
  against brute force in tests.

All vector math is higher-order built-ins (functions/vectors.py) — no
Python UDF, no collect of the corpus. The plane matrix is a deterministic
seeded constant broadcast as literals (tiny: num_planes x dim floats).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.vectors import cosine_similarity, dot, l2_norm


def cosine_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query DataFrame (broadcast
    cross join — the query never leaves the cluster, the corpus is scanned
    once; orderBy+limit plans as TakeOrderedAndProject)."""
    q = query.select(F.col(vec_col).alias("_qvec"))
    return (
        corpus.crossJoin(F.broadcast(q))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("_qvec")).alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 4).alias("cosine_sim"))
    )


def random_planes(dim: int, num_planes: int = 16, seed: int = 7) -> list[list[float]]:
    """Deterministic seeded hyperplane set (public-knowledge SimHash-for-
    cosine construction, Charikar 2002)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim)).tolist()


def lsh_bucket(vec_col, planes: list[list[float]]) -> F.Column:
    """Pack sign(v . plane_i) bits into a long bucket id."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_lit = F.array(*[F.lit(float(x)) for x in plane])
        d = dot(vec_col, plane_lit)
        bucket = bucket + F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_lsh_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: candidates must share at least one of `bands`
    sign-bit bands with the query (multi-probe banding trades candidates
    for recall), then exact cosine ranks the candidates.

    At scale the banded bucket ids are a precomputed index column; the
    per-query work is `bands` hash lookups + exact rerank of a small
    candidate set.
    """
    planes = random_planes(dim, num_planes, seed)
    bits_per_band = num_planes // bands

    def banded(df: DataFrame, name: str) -> DataFrame:
        b = lsh_bucket(F.col(vec_col), planes)
        df = df.withColumn("_bucket", b)
        bandcols = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftright(F.col("_bucket"), i * bits_per_band)
                    .bitwiseAND(F.lit((1 << bits_per_band) - 1))
                    .alias("bh"),
                )
                for i in range(bands)
            ]
        )
        return df.select(
            F.col(id_col).alias(f"{name}_id"),
            F.col(vec_col).alias(f"{name}_vec"),
            F.explode(bandcols).alias("bb"),
        ).select(f"{name}_id", f"{name}_vec", "bb.band", "bb.bh")

    c = banded(corpus, "c")
    q = banded(query, "q").drop("q_id")
    cands = (
        c.join(F.broadcast(q), ["band", "bh"])
        .select("c_id", "c_vec", "q_vec")
        .distinct()
    )
    return (
        cands.select(
            F.col("c_id").alias(id_col),
            cosine_similarity(F.col("c_vec"), F.col("q_vec")).alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 4).alias("cosine_sim"))
    )


def ivf_seed_centroids(
    corpus: DataFrame, nlist: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """Deterministic coarse centroids: the `nlist` lowest-id vectors,
    L2-normalized. A bounded O(nlist x dim) driver-side constant — the
    index-build step, like broadcasting a dim table. At 100 TB these come
    from MLlib KMeans over a sample instead; the query path is unchanged."""
    rows = corpus.orderBy(id_col).limit(nlist).select(vec_col).collect()
    cents = []
    for r in rows:
        v = [float(x) for x in r[0]]
        n = sum(x * x for x in v) ** 0.5 or 1.0
        cents.append([x / n for x in v])
    return cents


def _centroid_dots(vec_col, cents: list[list[float]]) -> list[F.Column]:
    return [
        dot(vec_col, F.array(*[F.lit(float(x)) for x in c])) for c in cents
    ]


def _nearest_centroid(vec_col, cents: list[list[float]]) -> F.Column:
    """argmax_i dot(v, c_i) over unit centroids == nearest by cosine
    (|v| is constant across candidates). Expressed as sort-of-16-structs,
    NOT a chained when(): a fold that re-references its accumulator doubles
    the expression tree per step — 2^nlist nodes hangs Catalyst."""
    return _probe_set(vec_col, cents, 1)[0]


def _probe_set(vec_col, cents: list[list[float]], nprobe: int) -> F.Column:
    """The query's `nprobe` nearest centroid ids, as an array<int>."""
    scored = F.array(
        *[
            F.struct(d.alias("d"), F.lit(i).alias("cid"))
            for i, d in enumerate(_centroid_dots(vec_col, cents))
        ]
    )
    top = F.slice(F.sort_array(scored, asc=False), 1, nprobe)
    return F.transform(top, lambda s: s["cid"])


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into `nlist` coarse
    cells by nearest centroid, probe only the query's `nprobe` nearest
    cells, exact-cosine rerank the survivors.

    Scale path: the cell id is a precomputed partition column of the
    index table, so a probe is partition pruning — each query touches
    ~nprobe/nlist of the corpus. `nprobe = nlist` degrades to exact
    brute force (pinned in tests as the correctness anchor).
    """
    cents = ivf_seed_centroids(corpus, nlist, id_col, vec_col)
    cells = corpus.withColumn("_cell", _nearest_centroid(F.col(vec_col), cents))
    q = query.select(
        F.col(vec_col).alias("_qvec"),
        _probe_set(F.col(vec_col), cents, nprobe).alias("_probes"),
    )
    return (
        cells.join(F.broadcast(q), F.array_contains(F.col("_probes"), F.col("_cell")))
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("_qvec")).alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 4).alias("cosine_sim"))
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = "label",
    threshold: float = 0.9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked on a coarse key
    (label/cluster/LSH bucket) so the self-join is per-block, not global
    all-pairs. Exact within blocks."""
    # Pre-normalize each vector ONCE (divide by its l2 norm) so the
    # per-pair work in the self-join is a single dot product instead of
    # dot + two norm recomputations — 3x less array math on the
    # quadratic(-per-block) stage.
    norm = l2_norm(F.col(vec_col))
    base = corpus.select(
        F.col(id_col).alias("id"),
        F.transform(vec_col, lambda x: x.cast("double") / norm).alias("nvec"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
        # merge hint: shuffle on the block key — broadcasting the whole
        # normalized corpus is only feasible at toy scale
        base = base.hint("merge")
    return (
        base.alias("a")
        .join(base.alias("b"), cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(dot(F.col("a.nvec"), F.col("b.nvec")), 4).alias("cosine_sim"),
        )
        .filter(F.col("cosine_sim") >= threshold)
    )
