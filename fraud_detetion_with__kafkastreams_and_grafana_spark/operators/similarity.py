"""Similarity search over embedding columns (ARRAY<FLOAT>).

Two paths, per the standard ANN playbook:
- brute-force cosine top-k: exact baseline — one scan, one TakeOrdered;
  at 100 TB this is the per-query fallback and the recall yardstick.
- random-hyperplane LSH buckets: signature = sign bits against a fixed
  seeded plane set; candidates share the query's bucket (multi-probe via
  band splits). Sub-linear candidate sets at scale; recall measured
  against brute force in tests.

Per-pair exact math (cosine rerank, near-dup verification) stays in
higher-order built-ins (functions/vectors.py). The INDEX math — signature
and cell assignment against a plane/centroid matrix — is an Arrow-batched
pandas-UDF matmul against a numpy matrix shipped via SparkContext
broadcast: one matrix copy per executor, O(batch x planes) BLAS per Arrow
batch. Never literal `F.array(F.lit(...))` matrices: those blow up the
Catalyst expression tree linearly in planes x dim and cap the index at
toy sizes (dim=768, num_planes=64 builds instantly as a matmul; as
literals it hangs codegen).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, IntegerType, LongType

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


def random_planes(dim: int, num_planes: int = 16, seed: int = 7) -> np.ndarray:
    """Deterministic seeded hyperplane set (public-knowledge SimHash-for-
    cosine construction, Charikar 2002). Shape (num_planes, dim)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((num_planes, dim))


def make_lsh_bucket_udf(df: DataFrame, planes: np.ndarray):
    """Sign-bit signature as an Arrow-batched matmul: bucket =
    sum_i 2^i * [v . plane_i > 0]. The plane matrix rides a SparkContext
    broadcast (one copy per executor, any index size); per batch the work
    is one (batch x dim) @ (dim x planes) BLAS call."""
    num_planes = planes.shape[0]
    if num_planes > 62:
        raise ValueError("bucket id packs sign bits into a signed long (<=62 planes)")
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(planes.T, dtype=np.float64)
    )
    weights = np.int64(1) << np.arange(num_planes, dtype=np.int64)

    @pandas_udf(LongType())
    def bucket(vec: pd.Series) -> pd.Series:
        if not len(vec):
            return pd.Series([], dtype="int64")
        arr = np.asarray(vec.tolist(), dtype=np.float64)
        bits = (arr @ bc.value) > 0
        return pd.Series(bits.astype(np.int64) @ weights)

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
    bucket_udf = make_lsh_bucket_udf(corpus, planes)

    def banded(df: DataFrame, name: str) -> DataFrame:
        df = df.withColumn("_bucket", bucket_udf(F.col(vec_col)))
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
) -> np.ndarray:
    """Deterministic coarse centroids: the `nlist` lowest-id vectors,
    L2-normalized. A bounded O(nlist x dim) driver-side constant — the
    index-build step, like broadcasting a dim table. For real corpora use
    `ivf_kmeans_centroids` (MLlib) instead; the query path is unchanged."""
    rows = corpus.orderBy(id_col).limit(nlist).select(vec_col).collect()
    cents = np.asarray([[float(x) for x in r[0]] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return cents / norms


def ivf_kmeans_centroids(
    corpus: DataFrame,
    nlist: int,
    vec_col: str = "embedding",
    seed: int = 7,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Learned coarse centroids via MLlib KMeans — the production
    index-build step at 100 TB: train on a row sample (distributed
    Lloyd's, treeAggregate partials; nothing but the k x dim centers ever
    reaches the driver), L2-normalize the centers so argmax-dot ==
    nearest-by-cosine in the query path."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    train = corpus.sample(sample_fraction, seed=seed) if sample_fraction else corpus
    feats = train.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=nlist, seed=seed, maxIter=20).fit(feats)
    cents = np.asarray(model.clusterCenters(), dtype=np.float64)
    norms = np.linalg.norm(cents, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return cents / norms


# Index-build/query split (same pattern as mlscore's model cache): the
# KMeans fit is the expensive offline step; m02 and l28 consume the SAME
# centroids for the same (dataset, nlist, seed). Keyed on applicationId so
# nothing leaks across sessions; values are tiny nlist x dim numpy arrays.
_CENTROID_CACHE: dict[tuple, np.ndarray] = {}


def get_or_build_kmeans_centroids(
    corpus: DataFrame,
    nlist: int,
    cache_key: str,
    vec_col: str = "embedding",
    seed: int = 7,
    sample_fraction: float | None = None,
) -> np.ndarray:
    """Train-once accessor for the KMeans index build: fit on first use
    per (application, cache_key, nlist, seed), then reuse — the
    model-registry read in front of a scheduled index-build job."""
    from ..sessioncache import session_cached

    spark = corpus.sparkSession
    app = spark.sparkContext.applicationId
    key = (app, cache_key, nlist, vec_col, seed, sample_fraction)
    return session_cached(
        _CENTROID_CACHE,
        key,
        lambda: ivf_kmeans_centroids(corpus, nlist, vec_col, seed, sample_fraction),
    )


def make_cell_udf(df: DataFrame, cents: np.ndarray):
    """Nearest-centroid cell id: argmax_i dot(v, c_i) over unit centroids
    == nearest by cosine (|v| constant across candidates). One broadcast
    matrix + one BLAS matmul per Arrow batch — nlist=1024, dim=768 is a
    routine (batch x 768) @ (768 x 1024) product, impossible as Catalyst
    literal expressions."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(cents.T, dtype=np.float64)
    )

    @pandas_udf(IntegerType())
    def cell(vec: pd.Series) -> pd.Series:
        if not len(vec):
            return pd.Series([], dtype="int32")
        arr = np.asarray(vec.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(arr @ bc.value, axis=1).astype(np.int32))

    return cell


def make_probes_udf(df: DataFrame, cents: np.ndarray, nprobe: int):
    """The query's `nprobe` nearest centroid ids as array<int> (same
    broadcast-matmul shape as make_cell_udf; ties resolve to the lowest
    cell id on both sides, so probing is consistent with assignment)."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(cents.T, dtype=np.float64)
    )

    @pandas_udf(ArrayType(IntegerType()))
    def probes(vec: pd.Series) -> pd.Series:
        if not len(vec):
            return pd.Series([], dtype="object")
        arr = np.asarray(vec.tolist(), dtype=np.float64)
        d = arr @ bc.value
        idx = np.argsort(-d, axis=1, kind="stable")[:, :nprobe].astype(np.int32)
        return pd.Series([row.tolist() for row in idx])

    return probes


def ivf_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into `nlist` coarse
    cells by nearest centroid, probe only the query's `nprobe` nearest
    cells, exact-cosine rerank the survivors.

    Scale path: the cell id is a precomputed partition column of the
    index table, so a probe is partition pruning — each query touches
    ~nprobe/nlist of the corpus. `nprobe = nlist` degrades to exact
    brute force (pinned in tests as the correctness anchor).

    `centroids`: pass a precomputed (nlist x dim) unit matrix (e.g. from
    ivf_kmeans_centroids) to skip the deterministic seed build.
    """
    cents = (
        centroids
        if centroids is not None
        else ivf_seed_centroids(corpus, nlist, id_col, vec_col)
    )
    cells = corpus.withColumn(
        "_cell", make_cell_udf(corpus, cents)(F.col(vec_col))
    )
    q = query.select(
        F.col(vec_col).alias("_qvec"),
        make_probes_udf(query, cents, nprobe)(F.col(vec_col)).alias("_probes"),
    )
    return (
        # broadcast bound: q is the caller's query frame — the API
        # contract keeps queries the small side (probe batch, not corpus)
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
    # quadratic(-per-block) stage. The norm must NOT appear inside a
    # transform lambda (it would re-evaluate the full O(dim) aggregate
    # PER ELEMENT, and interpreted HOFs make that dim^2 real work), and
    # a chained projection does not help — CollapseProject re-inlines a
    # once-referenced alias straight back into the lambda (verified on
    # the optimized plan). zip_with against array_repeat(norm, dim)
    # evaluates the norm exactly once per row, outside any lambda.
    norm = l2_norm(F.col(vec_col))
    nvec = F.zip_with(
        F.col(vec_col),
        F.array_repeat(norm, F.size(F.col(vec_col))),
        lambda x, n: x.cast("double") / n,
    )
    base = corpus.select(
        F.col(id_col).alias("id"),
        nvec.alias("nvec"),
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


def pq_codebook(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Product-quantization codebook (m subspaces x ksub centroids): the
    ksub seed vectors with the smallest multiplicative-hash ids, sliced
    into m contiguous subvectors. Deterministic (same corpus -> same
    codebook) and bounded: only ksub rows ever reach the driver, like
    the IVF seed path. Production swap-in: per-subspace MLlib KMeans
    (same shape, learned centroids), identical encode path.

    Returns m x ksub x (dim/m) float64."""
    h = F.pmod(F.col(id_col) * F.lit(2654435761), F.lit(1000000007))
    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(h.asc(), F.col(id_col).asc())
        .limit(ksub)
        .collect()
    )
    mat = np.asarray([r.v for r in rows], dtype=np.float64)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    return np.stack([mat[:, j * sub : (j + 1) * sub] for j in range(m)])


def make_pq_encode_udf(df: DataFrame, codebook: np.ndarray):
    """PQ encoder: per subspace, the index of the nearest centroid by
    squared euclidean — vectorized as one BLAS matmul per (Arrow batch,
    subspace) against the broadcast codebook. A 64-dim float vector
    (256 bytes) compresses to m=8 small ints; at 100 TB the code table
    is ~32x smaller than the raw embeddings and ADC scans run on codes."""
    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(codebook, dtype=np.float64)
    )

    @pandas_udf(ArrayType(IntegerType()))
    def encode(vec: pd.Series) -> pd.Series:
        if not len(vec):
            return pd.Series([], dtype="object")
        arr = np.asarray(vec.tolist(), dtype=np.float64)
        cb = bc.value
        m, ksub, sub = cb.shape
        codes = np.empty((arr.shape[0], m), dtype=np.int32)
        for j in range(m):
            x = arr[:, j * sub : (j + 1) * sub]
            c = cb[j]
            d = (
                (x * x).sum(axis=1)[:, None]
                - 2.0 * (x @ c.T)
                + (c * c).sum(axis=1)[None, :]
            )
            codes[:, j] = np.argmin(d, axis=1)
        return pd.Series([row.tolist() for row in codes])

    return encode


def pq_decode(codebook: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Reconstruct vectors from PQ codes (test/ADC helper): concatenate
    each subspace's selected centroid."""
    m, ksub, sub = codebook.shape
    return np.concatenate(
        [codebook[j][codes[:, j]] for j in range(m)], axis=1
    )


def pq_encode(
    corpus: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: np.ndarray | None = None,
) -> DataFrame:
    """Encode every corpus vector to its PQ codes: (id, codes ARRAY<INT>)."""
    cb = pq_codebook(corpus, m, ksub, id_col, vec_col) if codebook is None else codebook
    enc = make_pq_encode_udf(corpus, cb)
    return corpus.select(F.col(id_col), enc(F.col(vec_col)).alias("codes"))


def pq_adc_topk(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC (asymmetric distance computation) ANN: the query builds an
    m x ksub table of squared distances to every subspace centroid ONCE;
    each corpus vector's approximate distance is then m table lookups
    over its 8-int code — no float vector is touched during the scan.
    The `shortlist` nearest-by-ADC ids are exact-cosine reranked.

    Scale: the scan phase reads only the code table (~32x smaller than
    raw embeddings) plus a broadcast m x ksub lookup table; the rerank
    touches `shortlist` full vectors via a semi join. The 1-row query
    fetch and the codebook are bounded driver transfers, like the IVF
    seed path."""
    cb = pq_codebook(corpus, m, ksub, id_col, vec_col)
    codes = pq_encode(corpus, m, ksub, id_col, vec_col, codebook=cb)

    qv = np.asarray(query.select(vec_col).head()[0], dtype=np.float64)
    sub = qv.shape[0] // m
    # dist_table[j][c] = || q_j - centroid_{j,c} ||^2
    dist_table = np.stack(
        [((cb[j] - qv[j * sub : (j + 1) * sub]) ** 2).sum(axis=1) for j in range(m)]
    )
    bc = corpus.sparkSession.sparkContext.broadcast(dist_table)

    @pandas_udf(DoubleType())
    def adc(code_col: pd.Series) -> pd.Series:
        if not len(code_col):
            return pd.Series([], dtype="float64")
        C = np.asarray(code_col.tolist(), dtype=np.int64)
        t = bc.value
        d = np.zeros(C.shape[0], dtype=np.float64)
        for j in range(t.shape[0]):
            d += t[j][C[:, j]]
        return pd.Series(d)

    short = (
        codes.select(id_col, adc(F.col("codes")).alias("_adc"))
        .orderBy(F.asc("_adc"), F.asc(id_col))
        .limit(shortlist)
        .select(id_col)
    )
    return cosine_topk(
        corpus.join(short, id_col, "left_semi"), query, k, id_col, vec_col
    )


def _hashplane_sign(p: int, i, dim: int):
    """±1.0 sign for plane p, element i, from a fixed public LCG-style
    integer hash — every step exact int64, so a SQL oracle replays it
    bit-identically (the l43/l44 recipe applied to hyperplanes)."""
    h = (F.lit(p * dim) + i) * F.lit(2654435761) + F.lit(1013904223)
    return F.when(
        (h % F.lit(4294967296)) < F.lit(2147483648), F.lit(1.0)
    ).otherwise(F.lit(-1.0))


def hashplane_bands(
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    vec_col: str = "embedding",
):
    """Per-row band hashes for the ±1 hash-plane family, as pure built-in
    expressions (no Python boundary at all): each plane's dot product is a
    left-to-right F.aggregate over zip_with(vec, index) — the accumulation
    order DuckDB's list_reduce uses, so signatures hash-match cross-engine.

    This is the ORACLE-REPLAYABLE twin of make_lsh_bucket_udf's
    broadcast-matmul: ±1 planes instead of Gaussian, expression-tree dot
    products instead of BLAS. Returns a list of `bands` UNBOUND Columns
    that resolve `vec_col` against whatever DataFrame they're selected
    from (the caller applies the same list to corpus and query)."""
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def _signed_elem(p: int):
        # binds p via closure: zip_with lambdas must take EXACTLY the
        # (value, index) pair — a defaulted third parameter makes pyspark
        # emit a 3-arg lambda and analysis fails
        return lambda v, i: v.cast("double") * _hashplane_sign(p, i, dim)

    dots = [
        F.aggregate(
            F.zip_with(F.col(vec_col), idx, _signed_elem(p)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for p in range(num_planes)
    ]
    bits = [(d > F.lit(0.0)).cast("int") for d in dots]
    if num_planes % bands:
        # trailing planes would be silently dropped (while still paying
        # their dot-product codegen); the l50 oracle assumes exact bands
        raise ValueError(f"num_planes={num_planes} not divisible by bands={bands}")
    bpb = num_planes // bands
    return [
        sum(bits[b * bpb + j] * F.lit(1 << j) for j in range(bpb)).alias(
            f"bh{b}"
        )
        for b in range(bands)
    ]


def ann_lsh_topk_hashplanes(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """ann_lsh_topk with the deterministic ±1 hash-plane family: banded
    sign-bit candidate generation (match on ANY of `bands` band hashes)
    + exact cosine rerank, fully value-hash-oracle-able.

    Scale shape is identical to the production path: corpus band rows
    equi-join the broadcast query bands, DISTINCT collapses multi-band
    hits, exact rerank touches candidates only."""
    bhs = hashplane_bands(dim, num_planes, bands, vec_col)

    def banded(df: DataFrame, name: str) -> DataFrame:
        withb = df.select(
            F.col(id_col).alias(f"{name}_id"),
            F.col(vec_col).alias(f"{name}_vec"),
            *bhs,
        )
        bandcols = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"), F.col(f"bh{b}").alias("bh")
                )
                for b in range(bands)
            ]
        )
        return withb.select(
            f"{name}_id", f"{name}_vec", F.explode(bandcols).alias("bb")
        ).select(f"{name}_id", f"{name}_vec", "bb.band", "bb.bh")

    c = banded(corpus, "c")
    q = banded(query, "q").drop("q_id")
    cands = (
        # broadcast bound: q is |query| x n_bands rows — the API contract
        # keeps queries the small side (probe batch, not corpus)
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


def _norm_expr(vec):
    """L2 norm as a left-to-right expression sum (DuckDB list_reduce
    order), with the zero-norm -> 1.0 guard ivf_seed_centroids applies."""
    s = F.aggregate(
        F.transform(vec, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = F.sqrt(s)
    return F.when(n == 0.0, F.lit(1.0)).otherwise(n)


def _dot_expr(a, b):
    """Sequential dot product of a float vector and a double vector."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _seeded_centroid_list(
    corpus: DataFrame, nlist: int, id_col: str, vec_col: str
) -> DataFrame:
    """1-row frame holding the seeded centroid list: the `id < nlist` rows
    L2-normalized (dense-id twin of ivf_seed_centroids), collected into a
    single array column so it can ride a broadcast."""
    cvec = F.transform(
        F.col(vec_col), lambda x: x.cast("double") / _norm_expr(F.col(vec_col))
    )
    return (
        corpus.where(F.col(id_col) < nlist)
        .select(F.col(id_col).alias("cid"), cvec.alias("cvec"))
        .agg(F.collect_list(F.struct("cid", "cvec")).alias("cents"))
    )


def seeded_cell_assignment(
    corpus: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cents: DataFrame | None = None,
) -> DataFrame:
    """(id, vec, _cell) with cell = argmax-dot over the seeded centroids:
    an order-independent FOLD over the broadcast centroid list (strict
    better-than with lower-cid tie-break), so a SQL oracle replays the
    assignment bit-exactly and the corpus never shuffles — the narrow-
    projection index-build shape shared by l51 (IVF) and l56 (SemDeDup).
    Pass a precomputed `cents` frame (from _seeded_centroid_list) when the
    caller also probes the centroids, so the aggregate/broadcast subtree
    is built once instead of twice."""
    if cents is None:
        cents = _seeded_centroid_list(corpus, nlist, id_col, vec_col)

    def _argmax_cell(vec):
        # Materialize each centroid's dot ONCE via transform, then fold
        # over the (cid, dot) structs. Folding directly over the
        # centroids would embed the 64-element dot in three places per
        # merge (two comparisons + the struct), and higher-order
        # functions are interpreted (no codegen) — the single-eval form
        # measured ~3x faster on the assignment stage.
        dots = F.transform(
            F.col("cents"),
            lambda c: F.struct(
                c["cid"].alias("cid"), _dot_expr(vec, c["cvec"]).alias("dot")
            ),
        )
        init = F.struct(
            F.lit(-1).cast("long").alias("cid"),
            F.lit(float("-inf")).alias("dot"),
        )

        def merge(acc, s):
            better = (s["dot"] > acc["dot"]) | (
                (s["dot"] == acc["dot"]) & (s["cid"] < acc["cid"])
            )
            return F.when(better, s).otherwise(acc)

        return F.aggregate(dots, init, merge, lambda acc: acc["cid"])

    return corpus.crossJoin(F.broadcast(cents)).select(
        F.col(id_col),
        F.col(vec_col),
        _argmax_cell(F.col(vec_col)).alias("_cell"),
    )


def ivf_topk_exprs(
    corpus: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """ivf_topk with EVERY stage in built-in expressions (zero Python, no
    numpy) so a SQL oracle replays it bit-exactly: seed centroids are the
    vec_id < nlist rows L2-normalized (dense-id twin of
    ivf_seed_centroids), cell assignment is an order-independent argmax
    FOLD over the broadcast centroid list (strict better-than with
    cid tie-break — no corpus x nlist shuffle, unlike a window argmax),
    probes are the query's nprobe nearest cells, rerank is exact cosine.

    Scale: cell assignment is a narrow projection over the scan (the
    centroid list rides a broadcast), exactly the production index-build
    shape; probing is the same array_contains broadcast join ivf_topk
    uses. The expression fold replaces the BLAS matmul — right at
    nlist=16, wrong at nlist=4096 (l13's matmul stays the scale path)."""
    cents = _seeded_centroid_list(corpus, nlist, id_col, vec_col)
    cells = seeded_cell_assignment(corpus, nlist, id_col, vec_col, cents=cents)

    q1 = query.select(F.col(vec_col).alias("_qvec"))
    from pyspark.sql.window import Window

    qd = (
        cents.select(F.explode("cents").alias("c"))
        .crossJoin(F.broadcast(q1))
        .select(
            F.col("c.cid").alias("cid"),
            _dot_expr(F.col("_qvec"), F.col("c.cvec")).alias("d"),
        )
    )
    rn = F.row_number().over(Window.orderBy(F.desc("d"), F.asc("cid")))
    probes = (
        qd.withColumn("rn", rn)
        .where(F.col("rn") <= nprobe)
        .agg(F.collect_list("cid").alias("_probes"))
        .crossJoin(F.broadcast(q1))
    )
    return (
        cells.join(
            F.broadcast(probes),
            F.array_contains(F.col("_probes"), F.col("_cell")),
        )
        .select(
            F.col(id_col),
            cosine_similarity(F.col(vec_col), F.col("_qvec")).alias("_cos"),
        )
        .orderBy(F.desc("_cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 4).alias("cosine_sim"))
    )


def topk_per_query(
    scored: DataFrame, k: int, salt_col: str = "cid", n_salts: int = 32
) -> DataFrame:
    """Skew-free per-query top-k over (qid, cid, _cos): the classic
    two-phase reduction — phase 1 ranks inside (qid, salt) partitions
    (row_number over corpus rows split n_salts ways, so no single
    partition is corpus-sized), phase 2 ranks the surviving
    qid x n_salts x k rows per qid. Equivalent to a global per-qid
    row_number under the same total order (cos desc, cid asc), because
    every global top-k row survives its salt's local top-k."""
    from pyspark.sql.window import Window

    order = [F.desc("_cos"), F.asc("cid")]
    w1 = Window.partitionBy("qid", "salt").orderBy(*order)
    w2 = Window.partitionBy("qid").orderBy(*order)
    local = (
        scored.withColumn(
            "salt", F.pmod(F.col(salt_col), F.lit(n_salts))
        )
        .withColumn("_rk1", F.row_number().over(w1))
        .where(F.col("_rk1") <= k)
    )
    return (
        local.withColumn("_rk2", F.row_number().over(w2))
        .where(F.col("_rk2") <= k)
        .select("qid", "cid", "_cos")
    )


def ann_recall_eval(
    corpus: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    queries: DataFrame | None = None,
) -> DataFrame:
    """Retrieval EVALUATION for the ANN ladder: recall@k of the
    hash-plane LSH pipeline (l50's oracle-able family) against the
    exact cosine top-k, over the first `n_queries` vectors as the query
    set. Returns one row per query: (query_id, n_ann, n_overlap) —
    integer counts, so the whole evaluation value-hash-replays
    (recall@k = n_overlap / k is derivable but kept integer).

    Scale: the query set is bounded (broadcasts everywhere); the exact
    baseline is ONE corpus scan scored against all queries at once,
    reduced by the two-phase salted top-k (topk_per_query — no
    per-query corpus-sized window partition, the skew trap of naive
    PARTITION BY qid); the ANN side reranks banded candidates only,
    same shape as l50. Evaluation cost is one scan + bounded joins
    regardless of corpus size."""
    if queries is None:
        queries = corpus.where(F.col(id_col) < n_queries)
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qe")
    )
    ex_scored = corpus.crossJoin(F.broadcast(q)).select(
        "qid",
        F.col(id_col).alias("cid"),
        cosine_similarity(F.col(vec_col), F.col("qe")).alias("_cos"),
    )
    exact = topk_per_query(ex_scored, k).select("qid", "cid")

    bhs = hashplane_bands(dim, num_planes, bands, vec_col)

    def banded(df: DataFrame, name: str, keep_id: bool) -> DataFrame:
        withb = df.select(
            F.col(id_col).alias(f"{name}_id"),
            F.col(vec_col).alias(f"{name}_vec"),
            *bhs,
        )
        bandcols = F.array(
            *[
                F.struct(F.lit(b).alias("band"), F.col(f"bh{b}").alias("bh"))
                for b in range(bands)
            ]
        )
        return withb.select(
            f"{name}_id", f"{name}_vec", F.explode(bandcols).alias("bb")
        ).select(f"{name}_id", f"{name}_vec", "bb.band", "bb.bh")

    c = banded(corpus, "c", True)
    qb = banded(queries, "q", True)
    ann_scored = (
        # broadcast bound: qb is |queries| x n_bands rows — the API
        # contract keeps queries the small side (probe batch, not corpus)
        c.join(F.broadcast(qb), ["band", "bh"])
        .select(
            F.col("q_id").alias("qid"),
            F.col("c_id").alias("cid"),
            "c_vec",
            "q_vec",
        )
        .distinct()
        .select(
            "qid",
            "cid",
            cosine_similarity(F.col("c_vec"), F.col("q_vec")).alias("_cos"),
        )
    )
    ann = topk_per_query(ann_scored, k).select("qid", "cid")

    n_ann = ann.groupBy("qid").agg(F.count("*").cast("long").alias("n_ann"))
    overlap = (
        exact.join(
            ann.withColumn("_hit", F.lit(1)), ["qid", "cid"], "left"
        )
        .groupBy("qid")
        .agg(F.count_if(F.col("_hit").isNotNull()).cast("long").alias("n_overlap"))
    )
    return (
        n_ann.join(overlap, "qid")
        .select(
            F.col("qid").cast("long").alias("query_id"),
            "n_ann",
            "n_overlap",
        )
        .orderBy("query_id")
    )


def _sqdist_expr(a, b):
    """Squared L2 distance as a left-to-right expression sum (DuckDB
    list_reduce order) — deterministic IEEE doubles, no reordering."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kcenter_coreset(
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 2-approximation) —
    the diversity-sampling step of embedding-based training-data
    selection: seed with the lowest id, then k rounds of 'pick the
    point farthest (max-min squared L2) from everything selected',
    ties to the lower id. Returns (pick_rank, vec_id, dist_sq) with the
    seed as rank 0 — the farthest-point trajectory IS the coreset and
    its dist_sq column is the 2-approximation's coverage radius
    schedule.

    Scale: k bounded passes over the corpus, each one scan + chained
    1-row broadcast crossJoins (the m13 winner shape — every selected
    point is a localCheckpointed 1-row frame) + a TakeOrdered argmax;
    the running min-distance is least() over <=k broadcast distances,
    so no corpus-sized state, no checkpointed corpus copy, and the
    anti-join against picked ids is <=k rows broadcast. Squared
    distances accumulate left-to-right (DuckDB list_reduce order), so
    the whole trajectory value-hash-replays."""
    seed = (
        corpus.orderBy(F.asc(id_col))
        .limit(1)
        .select(
            F.col(id_col).alias("w_id"), F.col(vec_col).alias("w_vec")
        )
        .localCheckpoint()
    )
    winners = [seed]
    out_rows = [
        seed.select(
            F.lit(0).cast("long").alias("pick_rank"),
            F.col("w_id").cast("long").alias("vec_id"),
            F.lit(0.0).alias("dist_sq"),
        )
    ]
    for t in range(1, k + 1):
        scored = corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
        )
        picked = winners[0].select("w_id")
        for wfr in winners[1:]:
            picked = picked.unionByName(wfr.select("w_id"))
        scored = scored.join(
            F.broadcast(picked.withColumnRenamed("w_id", "cid")),
            "cid",
            "anti",
        )
        dists = []
        for i, wfr in enumerate(winners):
            w = wfr.select(F.col("w_vec").alias(f"_w{i}"))
            scored = scored.crossJoin(F.broadcast(w))
            dists.append(_sqdist_expr(F.col("cvec"), F.col(f"_w{i}")))
        mind = dists[0] if len(dists) == 1 else F.least(*dists)
        win = (
            scored.select("cid", "cvec", mind.alias("_mind"))
            .orderBy(F.desc("_mind"), F.asc("cid"))
            .limit(1)
            .select(
                F.col("cid").alias("w_id"),
                F.col("cvec").alias("w_vec"),
                F.col("_mind").alias("w_dist"),
            )
            .localCheckpoint()
        )
        winners.append(win)
        out_rows.append(
            win.select(
                F.lit(t).cast("long").alias("pick_rank"),
                F.col("w_id").cast("long").alias("vec_id"),
                F.round("w_dist", 6).alias("dist_sq"),
            )
        )
    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("pick_rank")
