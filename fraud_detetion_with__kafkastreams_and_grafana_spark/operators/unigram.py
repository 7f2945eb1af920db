"""Unigram-LM (SentencePiece-class) tokenizer trainer, Spark-first.

The tokenizer family's second production class (the first, greedy-merge
BPE, is l58/l60): seed a subword vocabulary from corpus substrings, then
alternate (E) Viterbi segmentation of the corpus under the current vocab
with (M) integer re-estimation of piece frequencies from actual usage
plus pruning of the least-used pieces — the hard-EM variant of the
SentencePiece trainer (Kudo 2018), whose E-step hard-assigns each word
its single best segmentation.

Made hash-exact (the m08/m13 discipline): probabilities never appear.
The Viterbi objective is the single int64 score

    sum over chosen pieces of (BIG - min(freq(piece), CAP))

with BIG > W*CAP, which is exactly lexicographic (fewest tokens, then
highest cumulative piece frequency) — so the full training trajectory
(vocab sizes, corpus token counts, corpus scores, and an
order-independent bit_xor digest of the per-piece usage multiset)
value-hash-replays on DuckDB, and a pure-Python brute-force closure can
pin both engines (tests/test_properties.py).

Spark-first lowering: words are the DISTINCT corpus words with counts
(bounded: every word is <= W chars, so the frame is alphabet-bounded
regardless of corpus size); the per-word Viterbi DP over <= W positions
with pieces <= L chars unrolls into a fixed fan of column expressions —
edge costs pivot to W*L static columns via one (word, position) explode
joined BROADCAST against the vocab (the vocab is top-N by construction,
never corpus-sized), then d_j / ptr_j / the backtrace walk are pure
whole-stage-codegen projections. No Python UDF anywhere; per round the
only shuffles are the two (piece, int64) aggregates (substring counts /
usage), both map-side combinable.

No reference twin: the reference (a 300-LoC Kafka Streams fraud
pipeline) has no text operators; this belongs to the mandated
LLM-data-pipeline extension surface alongside l58/l60.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import tokens

W_MAX = 8  # max trainable word length (DP positions)
L_MAX = 4  # max piece length
CAP = 10**9  # per-piece frequency clamp inside the edge cost
BIG = W_MAX * CAP + 1  # > any path's frequency sum => token count dominates
SEED_N = 60  # multi-char seed pieces (round 1)
PRUNE = (40, 30)  # multi-char vocab kept entering rounds 2, 3


def _valid_ik():
    return [(i, k) for k in range(1, L_MAX + 1) for i in range(W_MAX) if i + k <= W_MAX]


# --- shared expression generators -------------------------------------
# The Viterbi DP / backtrace ladder is emitted ONCE as dialect-neutral
# SQL strings (least / CASE / substr behave identically on Spark SQL and
# DuckDB) and consumed by BOTH _segment (via selectExpr) and oracle_sql,
# so the two sides cannot drift — and the Spark plan builds in a handful
# of py4j calls instead of thousands of Column-object round trips.


def _d_sql(j: int) -> str:
    cands = [
        f"{'0' if j == k else f'd_{j-k}'} + e_{j-k}_{k}"
        for k in range(1, min(L_MAX, j) + 1)
    ]
    return cands[0] if len(cands) == 1 else "least(" + ", ".join(cands) + ")"


def _ptr_sql(j: int) -> str:
    arms = " ".join(
        f"WHEN {'0' if j == k else f'd_{j-k}'} + e_{j-k}_{k} = d_{j} THEN {k}"
        for k in range(min(L_MAX, j), 0, -1)  # ties -> longest piece
    )
    return f"CASE {arms} END"


def _kt_sql(t: int) -> str:
    arms = " ".join(f"WHEN {j} THEN ptr_{j}" for j in range(1, W_MAX + 1))
    return f"CASE p_{t-1} {arms} END"


def _bt_step_sql(t: int) -> list[str]:
    return [
        f"{_kt_sql(t)} AS k_{t}",
        f"CASE WHEN k_{t} IS NOT NULL THEN"
        f" substr(word, p_{t-1} - k_{t} + 1, k_{t}) END AS piece_{t}",
        f"CASE WHEN k_{t} IS NOT NULL THEN p_{t-1} - k_{t}"
        f" ELSE p_{t-1} END AS p_{t}",
    ]


def _ntok_sql() -> str:
    return " + ".join(
        f"(CASE WHEN k_{t} IS NOT NULL THEN 1 ELSE 0 END)"
        for t in range(1, W_MAX + 1)
    )


def _score_sql() -> str:
    arms = " ".join(f"WHEN {j} THEN d_{j}" for j in range(1, W_MAX + 1))
    return f"CASE wl {arms} END"


def corpus_words(docs: DataFrame) -> DataFrame:
    """Distinct trainable words with corpus counts: (word, wcount, wl).
    Words longer than W_MAX chars are excluded from training (documented
    contract; the synthetic corpus tops out at 8). Materialized once —
    it feeds the seed count pass and every EM round."""
    return (
        docs.where(F.trim("text") != "")
        .select(F.explode(tokens("text")).alias("word"))
        .where(F.length("word").between(1, W_MAX))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcount"))
        .withColumn("wl", F.length("word").cast("int"))
        .localCheckpoint()
    )


def seed_vocab(words: DataFrame) -> DataFrame:
    """Round-1 vocabulary: every single character seen in the corpus
    (coverage guarantee — Viterbi always has a path) plus the top
    SEED_N multi-char substrings (len 2..L_MAX) by (weighted count
    desc, piece asc). freq is the weighted substring count. Top-N goes
    through orderBy().limit() (TakeOrderedAndProject — distributed
    partial top-K, deterministic because (freq desc, piece asc) is a
    total order), never a global row_number window, which would drag
    every piece row into one partition."""
    subs = ", ".join(
        f"CASE WHEN {i + k} <= wl THEN substr(word, {i + 1}, {k}) END"
        for (i, k) in _valid_ik()
    )
    pc = (
        words.selectExpr(
            "wcount", f"explode(array_compact(array({subs}))) AS piece"
        )
        .groupBy("piece")
        .agg(F.sum("wcount").cast("long").alias("freq"))
    )
    singles = pc.where(F.length("piece") == 1)
    multis = (
        pc.where(F.length("piece") >= 2)
        .orderBy(F.desc("freq"), F.asc("piece"))
        .limit(SEED_N)
    )
    return singles.unionByName(multis).localCheckpoint()


def _segment(words: DataFrame, vocab: DataFrame) -> DataFrame:
    """E-step: per-word Viterbi under `vocab`, fully unrolled.

    Returns (word, wcount, n_tokens, score, piece_1..piece_W) where
    piece_t are the chosen pieces in order (NULL-padded). Edge cost is
    BIG - min(freq, CAP); d_j is the best score to position j; ptr_j the
    chosen incoming piece length with ties broken toward the LONGEST
    piece; the backtrace walks ptr from wl with a static CASE ladder
    (positions are bounded by W_MAX, so the walk is W_MAX unrolled
    projection steps, never a loop over data). Every DP/backtrace
    expression comes from the shared generators above, verbatim."""
    ik = _valid_ik()
    cand_items = ", ".join(
        f"CASE WHEN {i + k} <= wl THEN"
        f" struct({i} AS i, {k} AS k, substr(word, {i + 1}, {k}) AS piece) END"
        for (i, k) in ik
    )
    cand = words.selectExpr(
        "word", f"explode(array_compact(array({cand_items}))) AS c"
    ).selectExpr("word", "c.i", "c.k", "c.piece")
    edges = cand.join(F.broadcast(vocab), "piece").selectExpr(
        "word", "i", "k", f"{BIG} - least(freq, {CAP}) AS cost"
    )
    wide = edges.groupBy("word").agg(
        *[
            F.expr(
                f"max(CASE WHEN i = {i} AND k = {k} THEN cost END) AS e_{i}_{k}"
            )
            for (i, k) in ik
        ]
    )
    df = words.join(wide, "word", "left")

    # forward DP + p_0, one projection (lateral column aliases)
    dp_exprs = ["wl AS p_0"]
    for j in range(1, W_MAX + 1):
        dp_exprs += [f"{_d_sql(j)} AS d_{j}", f"{_ptr_sql(j)} AS ptr_{j}"]
    df = df.selectExpr("*", *dp_exprs)

    # backtrace: one chained projection per step (k_t referenced
    # laterally by piece_t / p_t within the step)
    for t in range(1, W_MAX + 1):
        df = df.selectExpr("*", *_bt_step_sql(t))

    return df.selectExpr(
        "word",
        "wcount",
        f"CAST({_ntok_sql()} AS BIGINT) AS n_tokens",
        f"CAST({_score_sql()} AS BIGINT) AS score",
        *[f"piece_{t}" for t in range(1, W_MAX + 1)],
    )


def _usage(seg: DataFrame) -> DataFrame:
    """M-step counts: corpus-weighted usage per piece from the E-step's
    chosen segmentations."""
    pieces = ", ".join(f"piece_{t}" for t in range(1, W_MAX + 1))
    return (
        seg.selectExpr(
            "wcount", f"explode(array_compact(array({pieces}))) AS piece"
        )
        .groupBy("piece")
        .agg(F.sum("wcount").cast("long").alias("usage"))
    )


def _piece_digest() -> F.Column:
    """Order-independent 60-bit digest of a (piece, usage) row — the l68
    bit_xor recipe, overflow-free at any corpus size."""
    return F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("piece"),
                    F.lit(":"),
                    F.col("usage").cast("string"),
                ).cast("binary")
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")


def train_unigram_lm(docs: DataFrame) -> DataFrame:
    """Three hard-EM rounds; returns the training trajectory, one row
    per round: (round, n_vocab, total_tokens, total_score, usage_xor).

    Round r segments under vocab_r; vocab_{r+1} keeps every single char
    (freq = its round-r usage, 0 if unused) plus the top PRUNE[r-1]
    multi-char pieces by (usage desc, piece asc) with freq = usage —
    re-estimation and pruning in one rule. Each round's vocab and the
    1-row stats frames are localCheckpointed (the m13 iterative-state
    discipline) so the plan stays linear across rounds."""
    words = corpus_words(docs)
    vocab = seed_vocab(words)
    # the coverage set: every single char in the corpus, kept in every
    # round's vocab regardless of usage (freq 0 if unused)
    singles_all = (
        vocab.where(F.length("piece") == 1).select("piece").localCheckpoint()
    )
    rows = []
    for r in range(1, len(PRUNE) + 2):
        # One job per round: usage is the segmentation's only consumer.
        # The round totals regroup EXACTLY from (usage, vocab):
        # total_tokens = sum(usage); total_score = sum(usage * cost)
        # with cost = BIG - min(freq, CAP) under THIS round's freqs —
        # integer-identical to summing per-word Viterbi scores (the
        # oracle keeps the per-word formulation, so the regrouping is
        # itself cross-checked by the driver's value hash).
        usage = _usage(_segment(words, vocab)).localCheckpoint()
        # broadcast bound: vocab is the trained piece inventory — capped
        # by the target vocabulary size, never corpus-proportional
        st = usage.join(F.broadcast(vocab), "piece").agg(
            F.sum("usage").cast("long").alias("total_tokens"),
            F.sum(
                F.col("usage")
                * (F.lit(BIG) - F.least(F.col("freq"), F.lit(CAP)))
            )
            .cast("long")
            .alias("total_score"),
            F.bit_xor(_piece_digest()).alias("usage_xor"),
        )
        row = (
            vocab.agg(F.count("*").cast("long").alias("n_vocab"))
            # broadcast bound: st is a global aggregate — exactly 1 row
            .crossJoin(F.broadcast(st))
            .select(
                F.lit(r).cast("long").alias("round"),
                "n_vocab",
                "total_tokens",
                "total_score",
                "usage_xor",
            )
        )
        rows.append(row)
        if r > len(PRUNE):
            break
        keep_n = PRUNE[r - 1]
        new_singles = singles_all.join(
            usage.where(F.length("piece") == 1), "piece", "left"
        ).select("piece", F.coalesce("usage", F.lit(0)).cast("long").alias("freq"))
        new_multis = (
            usage.where(F.length("piece") >= 2)
            .orderBy(F.desc("usage"), F.asc("piece"))
            .limit(keep_n)
            .select("piece", F.col("usage").cast("long").alias("freq"))
        )
        vocab = new_singles.unionByName(new_multis)
    out = rows[0]
    for r2 in rows[1:]:
        out = out.unionByName(r2)
    return out.orderBy("round")


def oracle_sql() -> str:
    """ANSI-SQL twin of train_unigram_lm for the DuckDB oracle harness,
    generated from the SAME constants (W_MAX/L_MAX/CAP/BIG/SEED_N/PRUNE)
    so the two sides cannot drift independently: the per-word Viterbi DP
    unrolls to the identical d_j / ptr_j / backtrace expression ladder
    via DuckDB's lateral column aliases, top-N selection is ORDER BY ..
    LIMIT under the same total order, and the usage digest is the same
    md5-prefix bit_xor. Also the reference implementation the pure-Python
    brute-force closure compares against (tests/test_properties.py)."""
    ik = _valid_ik()
    pos_vals = ", ".join(f"({i}, {k})" for (i, k) in ik)
    e_cols = ",\n             ".join(
        f"max(CASE WHEN i = {i} AND k = {k} THEN cost END) AS e_{i}_{k}"
        for (i, k) in ik
    )
    dp_cols = ",\n             ".join(
        f"{_d_sql(j)} AS d_{j},\n             {_ptr_sql(j)} AS ptr_{j}"
        for j in range(1, W_MAX + 1)
    )

    def bt_step(r: int, t: int) -> str:
        # One backtrace step per CTE, MATERIALIZED: DuckDB inlines
        # lateral aliases, so a single-SELECT ladder would re-expand
        # p_{t-1}/ptr_j into every reference and the expression tree
        # goes ~9^W — materializing each step keeps it linear (the SQL
        # analog of the Spark side's chained projections).
        src = f"dp{r}" if t == 1 else f"bt{r}_{t-1}"
        cols = ",\n             ".join(_bt_step_sql(t))
        return f""",
    bt{r}_{t} AS MATERIALIZED (
      SELECT *,
             {cols}
      FROM {src}
    )"""

    ntok = _ntok_sql()
    score_case = _score_sql()
    piece_list = ", ".join(f"piece_{t}" for t in range(1, W_MAX + 1))
    digest = (
        "bit_xor(CAST('0x' || substr(md5(piece || ':' || "
        "CAST(usage AS VARCHAR)), 1, 15) AS BIGINT))"
    )

    rounds = len(PRUNE) + 1
    parts = [
        rf"""
    WITH words AS MATERIALIZED (
      SELECT w AS word, CAST(count(*) AS BIGINT) AS wcount,
             CAST(len(w) AS INT) AS wl
      FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
            FROM documents WHERE trim(text) != '')
      WHERE len(w) BETWEEN 1 AND {W_MAX}
      GROUP BY 1
    ),
    pos(i, k) AS (VALUES {pos_vals}),
    pc AS MATERIALIZED (
      SELECT substr(word, i + 1, k) AS piece,
             CAST(sum(wcount) AS BIGINT) AS freq
      FROM words JOIN pos ON i + k <= wl
      GROUP BY 1
    ),
    singles AS MATERIALIZED (SELECT piece FROM pc WHERE len(piece) = 1),
    vocab1 AS MATERIALIZED (
      SELECT piece, freq FROM pc WHERE len(piece) = 1
      UNION ALL
      (SELECT piece, freq FROM pc WHERE len(piece) >= 2
       ORDER BY freq DESC, piece LIMIT {SEED_N})
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    ed{r} AS MATERIALIZED (
      SELECT word, any_value(wcount) AS wcount, any_value(wl) AS wl,
             {e_cols}
      FROM (
        SELECT w.word, w.wcount, w.wl, p.i, p.k,
               {BIG} - least(v.freq, {CAP}) AS cost
        FROM words w JOIN pos p ON p.i + p.k <= w.wl
        JOIN vocab{r} v ON v.piece = substr(w.word, p.i + 1, p.k)
      ) GROUP BY word
    ),
    dp{r} AS MATERIALIZED (
      SELECT *, wl AS p_0,
             {dp_cols}
      FROM ed{r}
    )"""
        )
        for t in range(1, W_MAX + 1):
            parts.append(bt_step(r, t))
        parts.append(
            f""",
    seg{r} AS MATERIALIZED (
      SELECT word, wcount,
             CAST({ntok} AS BIGINT) AS n_tokens,
             CAST({score_case} AS BIGINT) AS score,
             {piece_list}
      FROM bt{r}_{W_MAX}
    ),
    usage{r} AS MATERIALIZED (
      SELECT piece, CAST(sum(wcount) AS BIGINT) AS usage
      FROM (SELECT wcount, unnest([{piece_list}]) AS piece FROM seg{r})
      WHERE piece IS NOT NULL
      GROUP BY 1
    ),
    stats{r} AS (
      SELECT CAST({r} AS BIGINT) AS round,
             (SELECT CAST(count(*) AS BIGINT) FROM vocab{r}) AS n_vocab,
             (SELECT CAST(sum(wcount * n_tokens) AS BIGINT) FROM seg{r})
               AS total_tokens,
             (SELECT CAST(sum(wcount * score) AS BIGINT) FROM seg{r})
               AS total_score,
             (SELECT {digest} FROM usage{r}) AS usage_xor
    )"""
        )
        if r <= len(PRUNE):
            parts.append(
                f""",
    vocab{r + 1} AS MATERIALIZED (
      SELECT s.piece, CAST(coalesce(u.usage, 0) AS BIGINT) AS freq
      FROM singles s LEFT JOIN usage{r} u USING (piece)
      UNION ALL
      (SELECT piece, usage AS freq FROM usage{r} WHERE len(piece) >= 2
       ORDER BY usage DESC, piece LIMIT {PRUNE[r - 1]})
    )"""
            )
    union = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM stats{r}" for r in range(1, rounds + 1)
    )
    parts.append(
        f"""
    SELECT * FROM (
      {union}
    ) ORDER BY round
    """
    )
    return "".join(parts)
