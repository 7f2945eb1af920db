"""MLlib fraud-scoring tests: separation quality against the generating
rule, and batch-vs-streaming score parity (stream-static join + model
transform on a replayed micro-batch stream)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detetion_with__kafkastreams_and_grafana_spark.operators import mlscore as ML
from fraud_detetion_with__kafkastreams_and_grafana_spark.operators.detect import (
    EVENTS_FRAUD_THRESHOLD,
    events_as_transactions,
)
from fraud_detetion_with__kafkastreams_and_grafana_spark.sources import load_table

SF_MED = "/root/testdata/sf0.01"


def _feats_model(spark):
    tx = events_as_transactions(load_table(spark, SF_MED, "events"))
    stats = ML.user_stats(tx)
    feats = ML.fraud_features(tx, stats)
    return tx, stats, feats, ML.train_fraud_scorer(feats)


def test_model_separates_fraud(spark):
    """AUC against the threshold rule must be ~1 (the rule is learnable
    from the features) and predictions must agree with the rule for the
    vast majority of events."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    _, _, feats, model = _feats_model(spark)
    scored = model.transform(
        feats.withColumn("label", (F.col("amount") > EVENTS_FRAUD_THRESHOLD).cast("double"))
    )
    auc = BinaryClassificationEvaluator(metricName="areaUnderROC").evaluate(scored)
    assert auc > 0.99
    agree = scored.filter(F.col("prediction") == F.col("label")).count() / scored.count()
    assert agree > 0.95


def test_train_once_cache(spark):
    """get_or_train_fraud_scorer must fit at most once per (session,
    dataset, threshold): repeat calls return the SAME PipelineModel
    object (the m01 query path is score-only after the first call), and a
    different cache key or threshold gets its own independent fit."""
    tx = events_as_transactions(load_table(spark, SF_MED, "events"))
    feats = ML.fraud_features(tx, ML.user_stats(tx))
    m1 = ML.get_or_train_fraud_scorer(feats, cache_key="k1")
    m2 = ML.get_or_train_fraud_scorer(feats, cache_key="k1")
    assert m1 is m2
    m3 = ML.get_or_train_fraud_scorer(feats, cache_key="k2")
    assert m3 is not m1
    m4 = ML.get_or_train_fraud_scorer(feats, cache_key="k1", threshold=50.0)
    assert m4 is not m1
    # and the cached model still scores: one cheap narrow projection
    assert ML.score(m2, feats).limit(1).count() == 1


def test_batch_stream_score_parity(spark):
    """The SAME model applied to a replayed micro-batch stream yields the
    same per-event probabilities as the batch transform."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.operators.detect import (
        parse_wire,
    )
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.streaming_queries import (
        _events_wire,
    )
    from fraud_detetion_with__kafkastreams_and_grafana_spark.streaming.replay import (
        replay_wire_stream,
    )

    sf = "/root/testdata/sf0.001"
    tx = events_as_transactions(load_table(spark, sf, "events"))
    stats = ML.user_stats(tx)
    model = ML.train_fraud_scorer(ML.fraud_features(tx, stats))

    batch = {
        r.event_id: r.fraud_probability
        for r in ML.score(model, ML.fraud_features(tx, stats)).collect()
    }

    def xform(stream):
        # wire frames lack event_id; recover per-event identity via
        # (userId, timestamp) join is overkill for the test — rescore on
        # parsed wire rows keyed by (userId, amount, timestamp) instead.
        parsed = parse_wire(stream).withColumn(
            "event_id", F.xxhash64("userId", "amount", "timestamp")
        )
        return ML.score(model, ML.fraud_features(parsed, stats))

    streamed_rows = replay_wire_stream(
        spark, _events_wire(spark, sf), xform, output_mode="append"
    ).collect()

    # batch reference on the same keying
    wire_tx = parse_wire(_events_wire(spark, sf)).withColumn(
        "event_id", F.xxhash64("userId", "amount", "timestamp")
    )
    batch_same_key = {
        r.event_id: r.fraud_probability
        for r in ML.score(model, ML.fraud_features(wire_tx, stats)).collect()
    }
    got = {r.event_id: r.fraud_probability for r in streamed_rows}
    assert got == batch_same_key
    assert len(batch) > 0  # the native-batch path scored the same events


def test_kmeans_clusters_deterministic_and_consistent(spark):
    """m02: seeded KMeans centroids are deterministic across fits; the
    broadcast-matmul cell assignment covers every vector, uses all (or
    nearly all) of k clusters, and agrees with MLlib's own transform()."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from fraud_detetion_with__kafkastreams_and_grafana_spark.operators import (
        similarity as SIM,
    )

    em = load_table(spark, SF_MED, "embeddings")
    c1 = SIM.ivf_kmeans_centroids(em, nlist=10)
    c2 = SIM.ivf_kmeans_centroids(em, nlist=10)
    assert np.allclose(c1, c2)

    cell = SIM.make_cell_udf(em, c1)
    got = em.select("vec_id", cell(F.col("embedding")).alias("cluster")).collect()
    assert len(got) == em.count()
    clusters = {r.cluster for r in got}
    assert clusters <= set(range(10)) and len(clusters) >= 8

    # MLlib's own prediction must match the broadcast-matmul assignment
    # (same centroids; unit-normalization preserves the argmax for
    # cosine because embeddings are compared against unit centers —
    # verify on the un-normalized centers MLlib predicts with).
    feats = em.select(
        "vec_id",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )
    model = KMeans(k=10, seed=7, maxIter=20).fit(feats.select("features"))
    pred = {r.vec_id: r.prediction for r in model.transform(feats).collect()}
    raw = np.asarray(model.clusterCenters(), dtype=np.float64)
    # matmul argmin euclidean == argmax dot only after normalization;
    # check against the same normalized matrix the engine broadcasts
    agree = 0
    embs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in em.collect()}
    norm = raw / np.linalg.norm(raw, axis=1, keepdims=True)
    for r in got:
        v = embs[r.vec_id]
        assert r.cluster == int(np.argmax(norm @ v))
        if r.cluster == pred[r.vec_id]:
            agree += 1
    # cosine-vs-euclidean assignment differs only for vectors near cell
    # borders; the two must agree on the overwhelming majority
    assert agree >= 0.9 * len(got)


def test_m08_gd_trainer_learns(spark, sf_dir):
    """The oracle-replayable GD trainer (m08) must actually LEARN, not
    just be deterministic: the separating weight on the amount feature
    (the label is a threshold on it) must go positive and grow across
    steps, full-batch loss must strictly decrease each step, and the
    trained scorer must rank fraud rows above non-fraud on average."""
    import math

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.advanced import (
        _M08_STEPS,
        _m08_features,
        _m08_step,
    )
    from pyspark.sql import functions as F

    feats = _m08_features(spark, sf_dir).cache()
    try:
        w = spark.range(1).select(
            F.lit(0.0).alias("w1"), F.lit(0.0).alias("w2"), F.lit(0.0).alias("b")
        )
        z_of = lambda r: r["b"] + r["w1"] * F.col("x1") + r["w2"] * F.col("x2")

        def loss(wrow) -> float:
            z = z_of(wrow)
            p = F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
            # squared-error loss of the softsign link (what the residual
            # gradient (p - y) descends, up to the link's jacobian)
            return feats.agg(
                F.avg((p - F.col("y")) * (p - F.col("y")))
            ).collect()[0][0]

        losses, weights = [], []
        for _ in range(_M08_STEPS):
            wrow = w.collect()[0].asDict()
            losses.append(loss(wrow))
            w = _m08_step(feats, w)
            weights.append(w.collect()[0].asDict())
        losses.append(loss(weights[-1]))

        assert all(
            b < a for a, b in zip(losses, losses[1:])
        ), f"loss must strictly decrease: {losses}"
        # class imbalance pulls the bias down first, so w1 dips negative
        # on step 1 before the separator asserts itself; from step 2 on
        # it must grow monotonically and finish clearly positive
        w1_path = [wt["w1"] for wt in weights]
        assert w1_path[-1] > 0.5 and all(
            b > a for a, b in zip(w1_path[1:], w1_path[2:])
        ), f"amount weight must recover and grow: {w1_path}"
        assert all(math.isfinite(v) for wt in weights for v in wt.values())

        # trained scores separate the classes: mean p on fraud rows beats
        # mean p on non-fraud rows by a real margin
        final = weights[-1]
        z = z_of(final)
        p = F.lit(0.5) * (F.lit(1.0) + z / (F.lit(1.0) + F.abs(z)))
        m = (
            feats.groupBy("y")
            .agg(F.avg(p).alias("mp"))
            .collect()
        )
        mp = {int(r["y"]): r["mp"] for r in m}
        assert mp[1] - mp[0] > 0.05, mp
    finally:
        feats.unpersist()


def test_m12_stump_recovers_fraud_boundary(spark, sf_dir):
    """The stump sweep (m12) must LEARN the reference's fraud predicate
    from data: the rank-1 split is on the value-kilobucket feature at the
    bucket boundary containing the threshold (value/50 < 2 <=> value <
    100), and its error count is tiny (only value == 100.0 rows can
    land left of the boundary with y=0 ambiguity). Also pins internal
    consistency: every candidate's sides sum to the corpus and errors
    equals the majority-class complement on both sides."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.advanced import m12_stump_trainer

    rows = m12_stump_trainer(spark, sf_dir).collect()
    assert len(rows) >= 10
    n = rows[0]["n_left"] + rows[0]["n_right"]
    best = [r for r in rows if r["train_rank"] == 1]
    assert len(best) == 1
    b = best[0]
    assert (b["feature"], b["thr"]) == ("vkb", 2)
    assert b["errors"] <= n // 100  # near-perfect recovery of R6
    ranks = sorted(r["train_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))
    for r in rows:
        assert r["n_left"] + r["n_right"] == n
        assert r["errors"] == min(
            r["pos_left"], r["n_left"] - r["pos_left"]
        ) + min(r["pos_right"], r["n_right"] - r["pos_right"])
        assert 0 < r["n_left"] < n


def test_m10_confusion_sweep_consistent(spark, sf_dir):
    """Threshold-sweep semantics: every row's confusion quadrant sums to
    the corpus, tp/fp are non-increasing and fn/tn non-decreasing in
    threshold (monotone sweep), and recall matches tp against the
    constant positive total."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.advanced import m10_model_eval

    rows = sorted(
        m10_model_eval(spark, sf_dir).collect(), key=lambda r: r["threshold"]
    )
    assert len(rows) == 9
    n = rows[0]["tp"] + rows[0]["fp"] + rows[0]["fn"] + rows[0]["tn"]
    pos_tot = rows[0]["tp"] + rows[0]["fn"]
    for r in rows:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
        assert r["tp"] + r["fn"] == pos_tot
        if pos_tot:
            assert abs(r["recall"] - round(r["tp"] / pos_tot, 6)) < 1e-9
    tps = [r["tp"] for r in rows]
    fps = [r["fp"] for r in rows]
    assert tps == sorted(tps, reverse=True)
    assert fps == sorted(fps, reverse=True)


def test_m13_boosting_trajectory_and_deployed_agreement(spark, sf_dir):
    """m13 closes train->deploy for trees: round 1 (uniform weights) must
    equal m12's rank-1 stump; the weight trajectory must be exact
    fixed-rate AdaBoost (total weight grows by (B-1)*prev_err when a
    round re-picks a stump misclassifying the same rows); and the
    learned ensemble compiled to an m05-style CASE scorer must reproduce
    the training-time majority-vote error count exactly."""
    from pyspark.sql import functions as F

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.advanced import (
        _M13_B,
        _M13_ROUNDS,
        _m13_base,
        m12_stump_trainer,
        m13_boosted_stumps,
    )

    rows = {r["round"]: r for r in m13_boosted_stumps(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, _M13_ROUNDS + 2))
    stumps = [rows[t] for t in range(1, _M13_ROUNDS + 1)]
    ens = rows[_M13_ROUNDS + 1]
    assert ens["feature"] == "__vote__" and ens["thr"] is None

    m12_best = next(
        r for r in m12_stump_trainer(spark, sf_dir).collect()
        if r["train_rank"] == 1
    )
    assert (stumps[0]["feature"], stumps[0]["thr"]) == (
        m12_best["feature"], m12_best["thr"],
    )
    assert stumps[0]["w_err"] == m12_best["errors"]

    base = _m13_base(spark, sf_dir)
    n = base.count()
    assert stumps[0]["w_tot"] == n == ens["w_tot"]
    # every round's weighted error can't exceed half the total weight
    # (majority leaf labels), and total weight only grows
    for s in stumps:
        assert 0 <= s["w_err"] * 2 <= s["w_tot"]
    assert all(
        b["w_tot"] >= a["w_tot"] for a, b in zip(stumps, stumps[1:])
    )

    # deploy the learned ensemble as an m05-style CASE expression chain
    # and verify corpus-level agreement with the training-time vote
    def stump_pred(s):
        v = (
            F.col("hr") if s["feature"] == "hr"
            else F.col("um") if s["feature"] == "um"
            else F.col("vkb")
        )
        return F.when(
            v < F.lit(s["thr"]), F.lit(s["left_label"])
        ).otherwise(F.lit(s["right_label"]))

    vote = sum((stump_pred(s) for s in stumps), F.lit(0))
    pred = (vote >= F.lit((_M13_ROUNDS // 2) + 1)).cast("long")
    deployed_err = base.agg(
        F.sum((pred != F.col("y")).cast("long")).alias("e")
    ).collect()[0]["e"]
    assert deployed_err == ens["w_err"]
    assert _M13_B ** (_M13_ROUNDS - 1) <= 2**20  # int64 headroom is vast


def test_m14_preference_model_ranks(spark, sf_dir):
    """The Bradley-Terry trainer must LEARN to rank: the amount-diff
    weight comes out strongly positive (dx1 is the preference label's
    own signal, scaled), pairwise accuracy lands far above chance, and
    the counts are internally consistent."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.advanced import (
        m14_pairwise_preference_trainer,
    )

    row = m14_pairwise_preference_trainer(spark, sf_dir).collect()[0]
    assert row.n_pairs > 0
    assert 0 < row.n_correct <= row.n_pairs
    assert row.n_correct / row.n_pairs > 0.9, row
    assert row.w1_nanos > 10**8  # w1 > 0.1: the ranking signal dominates
