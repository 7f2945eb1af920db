"""Tests: pandas UDF paths, salted skew helpers, stateful streaming."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from fraud_detetion_with__kafkastreams_and_grafana_spark.operators import skew, udfs
from fraud_detetion_with__kafkastreams_and_grafana_spark.operators.detect import (
    EVENTS_FRAUD_THRESHOLD,
    events_as_transactions,
)
from fraud_detetion_with__kafkastreams_and_grafana_spark.sources import load_table


def _tx(spark, sf_dir):
    return events_as_transactions(load_table(spark, sf_dir, "events"))


def test_pandas_udf_matches_builtin(spark, sf_dir):
    """The Arrow-vectorized risk score equals the same closed form in
    built-in expressions."""
    tx = _tx(spark, sf_dir)
    got = udfs.with_risk_score(tx, EVENTS_FRAUD_THRESHOLD)
    builtin = F.round(
        F.least(
            F.greatest(F.col("amount") / EVENTS_FRAUD_THRESHOLD - 0.5, F.lit(0.0)),
            F.lit(1.0),
        ),
        6,
    )
    diff = got.withColumn("exp", builtin).filter(F.col("risk_score") != F.col("exp"))
    assert diff.count() == 0


def test_apply_in_pandas_zscore_matches_window_sql(spark, sf_dir):
    """Grouped-map z-score equals the window-function formulation."""
    tx = _tx(spark, sf_dir)
    got = {(r.userId, r.event_id): r.amount_z for r in udfs.per_user_zscore(tx).collect()}
    from pyspark.sql import Window

    w = Window.partitionBy("userId")
    expect = tx.select(
        "userId",
        "event_id",
        (
            (F.col("amount") - F.avg("amount").over(w)) / F.stddev_samp("amount").over(w)
        ).alias("z"),
    )
    for r in expect.collect():
        assert abs(got[(r.userId, r.event_id)] - r.z) < 1e-9


def test_salted_sum_count_equals_direct(spark, sf_dir):
    tx = _tx(spark, sf_dir)
    salted = {
        r.userId: (round(r.sum_value, 6), r.n_rows)
        for r in skew.salted_sum_count(tx, ["userId"], "amount").collect()
    }
    direct = {
        r.userId: (round(r.s, 6), r.c)
        for r in tx.groupBy("userId")
        .agg(F.sum("amount").alias("s"), F.count("*").alias("c"))
        .collect()
    }
    assert set(salted) == set(direct)
    for k in direct:
        assert salted[k][1] == direct[k][1]
        assert abs(salted[k][0] - direct[k][0]) < 1e-6


def test_replicate_broadcast_join_equals_plain(spark, sf_dir):
    fact = _tx(spark, sf_dir).withColumnRenamed("userId", "k").select("k", "amount")
    dim = (
        spark.range(200)
        .select(F.format_string("user_%03d", F.col("id").cast("int")).alias("k"))
        .withColumn("tag", F.upper("k"))
    )
    plain = fact.join(dim, "k").groupBy("k").count()
    salted = skew.replicate_broadcast_join(fact, dim, "k").groupBy("k").count()
    assert sorted((r.k, r["count"]) for r in plain.collect()) == sorted(
        (r.k, r["count"]) for r in salted.collect()
    )


def test_stateful_running_totals_across_batches(spark):
    """applyInPandasWithState keeps per-user state across micro-batches:
    the second batch's emitted totals include the first batch's rows."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.streaming import (
        stateful,
        topology,
    )

    b1 = [
        '{"userId":"user_001","amount":10500.0,"timestamp":1700000001}',
        '{"userId":"user_001","amount":10600.0,"timestamp":1700000002}',
        '{"userId":"user_002","amount":10400.0,"timestamp":1700000003}',
    ]
    b2 = ['{"userId":"user_001","amount":10001.0,"timestamp":1700000010}']

    with tempfile.TemporaryDirectory() as tmpdir:
        with open(f"{tmpdir}/b1.txt", "w") as f:
            f.write("\n".join(b1))
        stream_in = spark.readStream.format("text").schema("value STRING").load(tmpdir)
        fraud = topology.fraud_topology(stream_in)
        q = (
            stateful.running_user_totals(fraud)
            .writeStream.format("memory")
            .queryName("state_mem")
            .outputMode("update")
            .start()
        )
        try:
            q.processAllAvailable()
            with open(f"{tmpdir}/b2.txt", "w") as f:
                f.write("\n".join(b2))
            q.processAllAvailable()
            rows = spark.sql(
                "SELECT * FROM state_mem ORDER BY userId, n_tx"
            ).collect()
        finally:
            q.stop()

    by_user = {}
    for r in rows:  # keep the LAST emission per user
        by_user[r.userId] = (r.total_amount, r.n_tx)
    assert by_user["user_001"] == (10500.0 + 10600.0 + 10001.0, 3)
    assert by_user["user_002"] == (10400.0, 1)


def test_udtf_shingles_match_split(spark, sf_dir):
    """UDTF output equals built-in posexplode over the same tokenization."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("_udtf_test_docs")
    spark.udtf.register("shingle_udtf_t", udfs.make_shingle_udtf())
    got = spark.sql(
        "SELECT d.doc_id, s.pos, s.tok FROM _udtf_test_docs d, LATERAL shingle_udtf_t(d.text) s"
    )
    expect = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim("text"), r"\s+")).alias("pos", "tok"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_grouped_agg_udaf_matches_sql(spark, sf_dir):
    tx = _tx(spark, sf_dir)
    got = {
        r.userId: r.wmean
        for r in tx.groupBy("userId")
        .agg(F.round(udfs.amount_weighted_mean("amount"), 4).alias("wmean"))
        .collect()
    }
    expect = {
        r.userId: r.wmean
        for r in tx.groupBy("userId")
        .agg((F.round(F.sum(F.col("amount") * F.col("amount")) / F.sum("amount"), 4)).alias("wmean"))
        .collect()
    }
    for k, v in expect.items():
        assert abs(got[k] - v) < 1e-6


@pytest.mark.parametrize("variant", ["partial", "salted"])
def test_two_phase_udaf_equals_direct(spark, sf_dir, variant):
    """The partial/salt split must be invisible: both two-phase pandas
    UDAF forms merge to the same weighted mean as the single-phase
    GROUPED_AGG UDAF."""
    tx = _tx(spark, sf_dir)
    fn = (
        udfs.partial_weighted_mean
        if variant == "partial"
        else udfs.salted_weighted_mean
    )
    two_phase = {
        r.userId: r.wmean
        for r in fn(tx, ["userId"], "amount")
        .select("userId", F.round("wmean", 4).alias("wmean"))
        .collect()
    }
    direct = {
        r.userId: r.wmean
        for r in tx.groupBy("userId")
        .agg(F.round(udfs.amount_weighted_mean("amount"), 4).alias("wmean"))
        .collect()
    }
    assert two_phase.keys() == direct.keys()
    for k, v in direct.items():
        assert abs(two_phase[k] - v) < 1e-3, k


def test_l101_hot_shingle_join_gets_aqe_skew_split(spark):
    """The r12 verdict's l101 skew concern, demonstrated and mitigated:
    a stopword-like shingle shared by EVERY document makes one gh
    partition of the postings self-join quadratic (sum(df^2)) — the
    mega-partition class of guide §2.5. The mitigation the operator
    relies on is AQE's OptimizeSkewedJoin on exactly this join (it is
    deliberately unhinted; the downstream (doc_a, doc_b) aggregate
    re-partitions anyway so the split is free), and the result is
    partitioning-invariant integer arithmetic, so the split is
    result-identical. This test builds the adversarial fixture, drops
    the skew thresholds to fixture scale (at 100 TB the defaults trip
    the same way), asserts the executed plan shows the skew split, and
    checks the pair report against brute force."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.llmops import (
        _l101_pairs_from_arr,
    )

    n = 1200
    # every doc: the hot shingle + two private ones => no pair passes
    # the 0.5 cut; docs 0/1 additionally share "dup a b" => n_common=2
    # of min(n)=4 -> exactly one qualifying pair
    garr = F.when(
        F.col("id") < 2,
        F.array(
            F.lit("hot hot hot"),
            F.lit("dup a b"),
            F.concat(F.lit("u1 "), F.col("id").cast("string")),
            F.concat(F.lit("u2 "), F.col("id").cast("string")),
        ),
    ).otherwise(
        F.array(
            F.lit("hot hot hot"),
            F.concat(F.lit("u1 "), F.col("id").cast("string")),
            F.concat(F.lit("u2 "), F.col("id").cast("string")),
            F.concat(F.lit("u3 "), F.col("id").cast("string")),
        )
    )
    arr = spark.range(n).select(F.col("id").alias("doc_id"), garr.alias("garr"))

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # fixture-scale thresholds: the hot partition is ~tens of KB
        # here where production skew is hundreds of MB; the OPTIMIZER
        # RULE exercised is the same
        # 4 KB, not the 256 MB default: the hot partition here is 1200
        # identical-gh rows whose COMPRESSED shuffle blocks are a few
        # KB (identical longs compress extremely well); production hot
        # grams are hundreds of MB and trip the default. No
        # forceOptimizeSkewedJoin needed — the downstream aggregate
        # re-partitions, so the split introduces no extra shuffle.
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "4096",
        )
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4096")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out = _l101_pairs_from_arr(arr)
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)

    assert len(rows) == 1, rows
    r = rows[0]
    assert (r.doc_a, r.doc_b, r.n_common, r.n_a, r.n_b, r.overlap_ppm) == (
        0, 1, 2, 4, 4, 500000,
    ), rows
    # the executed (final AQE) plan must show the skew-split firing on
    # the postings self-join
    assert "skew=true" in plan, plan
