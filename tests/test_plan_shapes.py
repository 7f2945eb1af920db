"""Physical-plan shape pins for the round-4 queries: the scale posture
documented in SCALE.md, asserted against what Catalyst actually picks —
the same evidence style as test_bucketing_recovery (bucketed join has no
Exchange) and test_relational3's one-shuffle pivot pin.

These are cheap (plan-only, nothing executes) and fail loudly if a
refactor silently introduces an extra shuffle, splits a shared window
sort, or starts shuffling text instead of hashes.
"""

from __future__ import annotations

import pytest

from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import (
    llmops,
    relational3,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _node_indent(line: str) -> int:
    """Column where the operator name starts in a tree-rendered plan line
    (after the ' : +-' drawing characters); deeper children start further
    right, so ancestor/descendant is decidable from indents alone."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _subtrees(plan: str, op: str) -> list[list[str]]:
    """Every subtree rooted at a line containing `op`: the contiguous run
    of following lines whose operator indent is strictly deeper."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if op not in line:
            continue
        d = _node_indent(line)
        sub = []
        for nxt in lines[i + 1 :]:
            if _node_indent(nxt) <= d:
                break
            sub.append(nxt)
        out.append(sub)
    return out


def test_r67_both_window_fns_share_one_shuffle(spark, sf_dir):
    p = _plan(relational3.QUERIES["r67_range_frame_window"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Window") == 1, p  # sum+count in ONE window operator


def test_r71_two_window_passes_one_shuffle(spark, sf_dir):
    """Change detection + versioning share the (user_id, t, event_id)
    sort: two Window operators, ONE exchange."""
    p = _plan(relational3.QUERIES["r71_scd2_versions"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Window") == 2, p


def test_r69_plans_two_anti_joins_no_shuffle(spark, sf_dir):
    """NOT IN -> null-aware broadcast anti join; NOT EXISTS -> plain
    broadcast anti join. Both broadcast: zero exchanges."""
    p = _plan(relational3.QUERIES["r69_not_in_null_semantics"](spark, sf_dir))
    assert p.count("LeftAnti") == 2, p
    assert "Exchange hashpartitioning" not in p, p


def test_l40_is_pure_narrow_projection(spark, sf_dir):
    p = _plan(llmops.QUERIES["l40_int8_quantize"](spark, sf_dir))
    assert "Exchange" not in p, p  # zero shuffles: scan -> project


def test_l38_single_agg_shuffle_then_takeordered(spark, sf_dir):
    """Array-side pairing must NOT plan a per-token window or self-join;
    the wide ops are the two-phase distinct-df aggregate (partial on
    (pair, doc_id), final on pair — the standard count_distinct rewrite)
    and the top-100 TakeOrdered."""
    p = _plan(llmops.QUERIES["l38_bpe_pair_counts"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 2, p
    assert "TakeOrderedAndProject" in p, p
    assert "Window" not in p, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p


def test_l41_shuffles_hashes_not_text(spark, sf_dir):
    """The distinct-count must travel as xxhash64(text), never the text
    column itself, through the aggregate exchanges."""
    p = _plan(llmops.QUERIES["l41_source_dedup_report"](spark, sf_dir))
    assert "xxhash64" in p, p
    for line in p.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text" not in line, line


def test_l43_l44_band_joins_are_shuffle_not_broadcast(spark, sf_dir):
    """The banded self-joins must honor the merge hint: the build side is
    the whole corpus, so a broadcast (Catalyst's default at toy scale)
    would OOM a production run. CartesianProduct would mean the band key
    equi-condition was lost entirely."""
    for name in ("l43_minhash_oracle_pairs", "l44_simhash_oracle_pairs"):
        p = _plan(llmops.QUERIES[name](spark, sf_dir))
        assert "SortMergeJoin" in p, (name, p)
        assert "CartesianProduct" not in p, (name, p)


def test_m04_m05_model_export_is_shuffle_free_codegen(spark, sf_dir):
    """The exported-model scorers must stay a single narrow projection:
    scan -> project, whole-stage codegen, zero exchanges — the whole
    point of compiling weights/trees into built-in expressions."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    for name in ("m04_sql_logistic_score", "m05_tree_ensemble_score"):
        p = _plan(advanced.QUERIES[name](spark, sf_dir))
        assert "Exchange" not in p, (name, p)
        # executedPlan().toString() renders a codegen stage as "*(n) Op"
        assert p.lstrip().startswith("*("), (name, p)


def test_l46_has_no_global_window_sort(spark, sf_dir):
    """Curriculum staging must use the broadcast quantile-fence plan, not
    a whole-corpus ntile: no Window operator, no global Sort over the
    corpus, fences joined via broadcast."""
    p = _plan(llmops.QUERIES["l46_curriculum_stages"](spark, sf_dir))
    assert "Window" not in p, p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p, p


def test_l47_window_runs_on_aggregate_not_corpus(spark, sf_dir):
    """The Pareto window may only see the per-source aggregate: exactly
    one hash-aggregate exchange keyed on source before the window's
    single-partition exchange."""
    p = _plan(llmops.QUERIES["l47_token_share_pareto"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Window" in p, p


def test_l49_self_join_is_sort_merge_over_checkpoint(spark, sf_dir):
    """Both sides of the contamination self-join are corpus-sized: the
    merge hint must hold (no broadcast of a corpus-sized build side),
    and the gram index must come from the materialized checkpoint (no
    re-explode of the corpus per consumer)."""
    p = _plan(llmops.QUERIES["l49_contamination_matrix"](spark, sf_dir))
    assert "SortMergeJoin" in p, p
    assert "Scan ExistingRDD" in p, p  # localCheckpoint-backed gram index
    assert "CartesianProduct" not in p, p


def test_l51_cell_assignment_has_no_corpus_shuffle(spark, sf_dir):
    """The argmax fold must keep cell assignment a narrow projection:
    no hashpartitioning exchange anywhere (centroids + probes ride
    broadcasts; the only window runs over the 16-row centroid frame)."""
    p = _plan(llmops.QUERIES["l51_ivf_oracle_topk"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in p, p
    assert "TakeOrderedAndProject" in p, p


def test_m08_gradient_step_is_partial_final_agg_no_fact_broadcast(spark, sf_dir):
    """Each GD step must plan as ONE two-phase hash aggregate over the
    feature scan (partial map-side, final single-row), with only 1-row
    frames riding broadcasts — never the fact table — and no
    CartesianProduct (the weight join is a broadcast nested loop over
    one row)."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    p = _plan(advanced.QUERIES["m08_gd_trained_scorer"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    # No fact table rides a broadcast: every file scan found inside a
    # BroadcastExchange subtree must sit BELOW an aggregate (so the
    # broadcast payload is the 1-row aggregate result, never the scan
    # itself) — checked structurally via the tree indents, not substring
    # windows.
    subtrees = _subtrees(p, "BroadcastExchange")
    assert subtrees, p  # the weight join must broadcast the 1-row frame
    for sub in subtrees:
        for k, line in enumerate(sub):
            if "Scan parquet" in line or "FileScan" in line:
                d = _node_indent(line)
                assert any(
                    "HashAggregate" in anc and _node_indent(anc) < d
                    for anc in sub[:k]
                ), f"raw scan broadcast without an aggregate above it: {line}"


def test_l56_pair_join_merge_hinted_and_assignment_checkpointed(spark, sf_dir):
    """SemDeDup's pair stage must shuffle on the cluster key (sort-merge,
    corpus never broadcast) and read the cell assignment from the
    materialized checkpoint (one argmax-fold evaluation, not three)."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import llmops as L

    p = _plan(L.QUERIES["l56_semdedup_oracle"](spark, sf_dir))
    assert "SortMergeJoin" in p, p
    assert "Scan ExistingRDD" in p, p  # localCheckpoint-backed assignment
    assert "CartesianProduct" not in p, p


def test_r77_grid_is_the_broadcast_side(spark, sf_dir):
    """The temporal probe must broadcast the 10-row grid into the
    interval join — the SCD2 dimension (corpus-derived) must never sit
    under a BroadcastExchange."""
    p = _plan(relational3.QUERIES["r77_pointintime_join"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in p, p
    for block in p.split("BroadcastExchange")[1:]:
        # every broadcast subtree is the grid (built from an aggregate),
        # recognizable by its Expand/Generate over the 1-row bounds —
        # never a Window (the SCD2 build) below the broadcast
        assert "Window" not in block[:1200], block[:1200]


def test_r76_diff_is_two_aggs_one_join_integer_state(spark, sf_dir):
    """The snapshot diff must plan two partial+final aggregates and one
    sort-merge full-outer join on the 8-byte key; the state totals must
    travel as bigint cents (no double sum crosses the exchange)."""
    p = _plan(relational3.QUERIES["r76_snapshot_diff"](spark, sf_dir))
    assert "FullOuter" in p, p
    assert "CartesianProduct" not in p, p
    # Exactly two partial+final aggregate pairs keyed on user_id (one per
    # snapshot side), each summing integer cents (bigint) map-side...
    assert p.count("Exchange hashpartitioning") == 2, p
    assert p.count("partial_sum(cast(round") == 2, p
    assert p.count("functions=[count(1), sum(cast(round") == 2, p
    # ...and no double ever crosses an exchange as state: the only sums
    # in the plan are the bigint-cast cent sums.
    assert "sum(value" not in p, p
    assert "as bigint" in p, p


def test_l61_shuffles_hashes_merge_joined_one_window(spark, sf_dir):
    """Passage dedup must shuffle (doc_id, pos, hash) ints only — the
    text column never crosses an exchange — honor the merge hint on the
    join back to the corpus-derived shared-hash frame (a broadcast would
    OOM at scale), and run exactly one per-doc window for the
    gaps-and-islands merge."""
    p = _plan(llmops.QUERIES["l61_passage_dedup"](spark, sf_dir))
    assert "SortMergeJoin" in p, p
    assert "CartesianProduct" not in p, p
    assert p.count("Window") == 1, p
    assert "Scan ExistingRDD" in p, p  # checkpointed window-hash table
    for line in p.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text" not in line, line


def test_m09_rounds_read_checkpoint_no_corpus_shuffle_pre_agg(spark, sf_dir):
    """Every Lloyd round must read the ONE materialized training frame
    (no parquet scan survives into the unrolled plan), assign via the
    broadcast 1-row centroid list (no CartesianProduct — the cross join
    is a broadcast nested loop over one row), and shuffle only the
    (cid, component, int64-sum) aggregate rows."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    p = _plan(advanced.QUERIES["m09_kmeans_trainer"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "Scan ExistingRDD" in p, p  # localCheckpoint-backed features
    assert "Scan parquet" not in p and "FileScan" not in p, p
    for line in p.splitlines():
        if line.strip().startswith("Exchange hashpartitioning"):
            assert "cid" in line, line  # only cluster-state aggregates shuffle


def test_m12_sweep_aggregates_shuffle_feature_keys_only(spark, sf_dir):
    """The stump sweep must collapse the corpus in ONE parquet scan into
    the (feature, bucket) count aggregate — every hash exchange keys on
    `feature` (partial-agg rows, never events), and the only
    single-partition stage is the final ~41-row rank window."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    p = _plan(advanced.QUERIES["m12_stump_trainer"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert p.count("Scan parquet") == 1, p  # one corpus scan, unpivoted in-stage
    for line in p.splitlines():
        if line.strip().startswith("Exchange hashpartitioning"):
            assert "feature" in line, line


def test_l66_split_moves_ids_only_over_checkpointed_components(spark, sf_dir):
    """Cluster-holdout split must ride the session-materialized CC
    fixpoint (checkpoint-backed scan, no recomputed pair join) and move
    8-byte ids only: no exchange carries the text column, every hash
    exchange keys on doc_id or group_id, and nothing is cartesian."""
    p = _plan(llmops.QUERIES["l66_cluster_holdout_split"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "Scan ExistingRDD" in p, p  # checkpointed components fixpoint
    for line in p.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text" not in line, line
            if "hashpartitioning" in line:
                assert "doc_id" in line or "group_id" in line, line


def test_m13_sweep_shuffles_feature_keys_and_final_plan_is_checkpoint_union(
    spark, sf_dir
):
    """The boosted-stump trainer's per-round sweep must keep the m12
    posture — the corpus collapses in one scan into the (feature, bucket)
    weighted aggregate, every hash exchange keyed on `feature` — and the
    final returned plan must be the union of the 1-row checkpointed
    winner frames plus one ensemble aggregate over the checkpointed base
    (no parquet rescan, no CartesianProduct; the winner joins are
    broadcast nested loops over single rows)."""
    from pyspark.sql import functions as F

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    sweep = advanced._m13_sweep(
        advanced._m13_base(spark, sf_dir).withColumn(
            "w", F.lit(1).cast("long")
        )
    )
    ps = _plan(sweep)
    assert "CartesianProduct" not in ps, ps
    assert ps.count("Scan parquet") == 1, ps
    for line in ps.splitlines():
        if line.strip().startswith("Exchange hashpartitioning"):
            assert "feature" in line, line

    p = _plan(advanced.QUERIES["m13_boosted_stumps"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "Scan parquet" not in p and "FileScan" not in p, p
    assert "Scan ExistingRDD" in p, p  # checkpointed base + winners
    assert "BroadcastNestedLoopJoin" in p, p  # 1-row winner frames


def test_l68_corpus_joins_merge_only_broadcasts_are_aggregates(spark, sf_dir):
    """Index compaction must sort-merge every corpus-sized join (index
    frames, admitted ids, source map — none may broadcast) and move
    md5/int columns only: no exchange carries text, and any
    BroadcastExchange subtree must sit above an aggregate (the final
    tiny per-source join), never a raw scan."""
    p = _plan(llmops.QUERIES["l68_index_compaction"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" in p, p
    assert "Scan ExistingRDD" in p, p  # checkpointed index frames
    for line in p.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text" not in line, line
    for sub in _subtrees(p, "BroadcastExchange"):
        for k, line in enumerate(sub):
            if "Scan parquet" in line or "Scan ExistingRDD" in line:
                d = _node_indent(line)
                assert any(
                    "HashAggregate" in anc and _node_indent(anc) < d
                    for anc in sub[:k]
                ), f"corpus-sized frame under a broadcast: {line}"


def test_l84_query_frame_never_broadcasts(spark, sf_dir):
    """Retrieval eval must shuffle-join the (query_id, term) frame into
    the postings — that frame is corpus-proportional (the whole 10%
    test split) and broadcasting it OOMs executors at 100x scale (the
    round-8 verdict's one weak plan). Only term-TYPE frames (distinct
    query vocabulary, the post-cut df table) and 1-row stats may
    broadcast: every scan under a BroadcastExchange must have an
    aggregate above it inside that subtree, and the query-side join
    must be a SHUFFLE join — since round 13 a shuffled-HASH join
    (guide §3.1: both sides still shuffle by t, so the 100 TB
    never-broadcast posture is identical, but the per-partition hash
    build replaces two corpus-proportional sorts)."""
    p = _plan(llmops.QUERIES["l84_retrieval_eval"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "ShuffledHashJoin" in p, p
    for sub in _subtrees(p, "BroadcastExchange"):
        for k, line in enumerate(sub):
            if "Scan parquet" in line or "Scan ExistingRDD" in line:
                d = _node_indent(line)
                assert any(
                    "HashAggregate" in anc and _node_indent(anc) < d
                    for anc in sub[:k]
                ), f"corpus-proportional frame under a broadcast: {line}"


def test_l67_jpeg_roundtrip_is_one_scan_no_shuffle(spark, sf_dir):
    """The JPEG roundtrip must be the l52/l53/l57/l63 shape: one parquet
    scan feeding one Arrow-batched python runner — payloads never cross
    a shuffle or the driver. The ONLY exchange allowed is the
    scale-adaptive (doc_id, n_chars) spread BEFORE the python runner
    (multimodal._spread_deficient_scan: a one-split local fixture would
    otherwise serialize the whole decode onto one Python worker); it
    carries 16-byte metadata rows, never payloads, and disappears when
    the scan is already wide."""
    p = _plan(llmops.QUERIES["l67_jpeg_decode_roundtrip"](spark, sf_dir))
    assert p.count("Exchange") <= 1, p
    assert p.count("Scan parquet") == 1, p
    assert "MapInPandas" in p, p
    if "Exchange" in p:
        # the spread must sit BELOW the python runner (metadata in,
        # features out — decoded payload bytes never cross it)
        assert p.index("MapInPandas") < p.index("Exchange"), p


def test_l69_mulaw_roundtrip_is_one_scan_no_shuffle(spark, sf_dir):
    """Same contract as l67: one parquet scan, one Arrow-batched python
    runner, zero exchanges."""
    p = _plan(llmops.QUERIES["l69_mulaw_decode_roundtrip"](spark, sf_dir))
    assert "Exchange" not in p, p
    assert p.count("Scan parquet") == 1, p
    assert "MapInPandas" in p, p


def test_r82_cep_is_one_window_one_shuffle(spark, sf_dir):
    """The CEP lowering must cost exactly one per-user shuffle feeding
    one Window operator (all three lead()s share the sort), with the
    pattern predicate applied after — no self-joins, nothing cartesian."""
    p = _plan(relational3.QUERIES["r82_cep_card_testing"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Window") == 1, p
    assert "Join" not in p and "CartesianProduct" not in p, p


def test_r83_kleene_cep_reuses_one_shuffle(spark, sf_dir):
    """The Kleene lowering must reuse ONE user_id shuffle across both
    window passes (the probe-island window re-sorts in place) and
    aggregate islands map-side — no joins, nothing cartesian."""
    p = _plan(relational3.QUERIES["r83_cep_kleene_probe_run"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Window") == 2, p
    assert "Join" not in p and "CartesianProduct" not in p, p


def test_l73_l74_codec_transforms_one_scan_no_shuffle(spark, sf_dir):
    """The BMP downscale and AVI frame-sample must keep the l52/l67
    codec shape: one parquet scan feeding one Arrow-batched python
    runner, zero exchanges — payloads never cross a shuffle or the
    driver."""
    for name in ("l73_bmp_downscale_roundtrip", "l74_avi_frame_sample"):
        p = _plan(llmops.QUERIES[name](spark, sf_dir))
        assert "Exchange" not in p, (name, p)
        assert p.count("Scan parquet") == 1, (name, p)
        assert "MapInPandas" in p, (name, p)


def test_l71_corpus_joins_merge_only(spark, sf_dir):
    """The two-generation probe must sort-merge every corpus-sized join
    (md5/gram index frames vs batch probes — none may broadcast a
    corpus-derived side) and shuffle md5/int columns only; gen-2
    membership rides checkpointed id frames."""
    p = _plan(llmops.QUERIES["l71_two_generation_ingestion"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" in p, p
    assert "Scan ExistingRDD" in p, p  # checkpointed index/id frames
    for line in p.splitlines():
        if line.strip().startswith("Exchange"):
            assert "text" not in line, line


def test_l72_segmentation_broadcasts_vocab_no_python(spark, sf_dir):
    """The unigram E-step must stay entirely JVM-side (no Python runner
    of any kind — the DP is unrolled projections) with the top-N vocab
    joining BROADCAST against the word candidates; the only shuffles
    carry (word|piece, int64) aggregate keys."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.operators import (
        unigram as UG,
    )
    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables import (
        load_table,
    )

    words = UG.corpus_words(load_table(spark, sf_dir, "documents"))
    seg = UG._segment(words, UG.seed_vocab(words))
    p = _plan(seg)
    assert "BroadcastHashJoin" in p, p  # vocab side broadcasts
    # exactly one sort-merge: words joining back its own pivoted edge
    # frame (both sides are the alphabet-bounded words frame — never
    # corpus-sized); the vocab must NOT be the merge side
    assert p.count("SortMergeJoin") == 1, p
    assert "MapInPandas" not in p and "BatchEvalPython" not in p, p
    assert "ArrowEvalPython" not in p, p


def test_m15_isotonic_is_one_scan_then_bounded_joins(spark, sf_dir):
    """The isotonic fit must scan the corpus exactly ONCE (the bucket
    aggregate); every join runs on the checkpointed <=51-row bucket
    frame (broadcast/nested-loop is fine THERE — it is constant-size by
    construction), and no corpus-sized side is ever joined."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import (
        advanced,
    )

    p = _plan(advanced.QUERIES["m15_isotonic_calibration"](spark, sf_dir))
    assert p.count("Scan parquet") == 0, p  # bucket frame is checkpointed...
    assert "Scan ExistingRDD" in p, p  # ...and everything joins against it
    assert "SortMergeJoin" not in p, p


def test_r85_bloom_probe_fact_side_never_shuffles(spark, sf_dir):
    """The whole point of the runtime filter: the fact table (orders)
    reaches the bit-check via BROADCASTS only — the 1-row bloom array
    (nested-loop) and the audit key set (hash). The only exchange in the
    plan is the final 5-key priority aggregate; no sort-merge join, so
    no fact-sized shuffle exists anywhere."""
    p = _plan(relational3.QUERIES["r85_bloom_join_prune"](spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # 1-row bloom array
    assert "BroadcastHashJoin" in p, p  # audit-only exact membership
    # The dim side (302 keys) may exchange freely; the FACT scan must sit
    # under exactly one hash exchange — the final 5-key priority aggregate.
    fact_exchanges = [
        sub
        for sub in _subtrees(p, "Exchange hashpartitioning")
        if any("orders" in line for line in sub)
    ]
    assert len(fact_exchanges) == 1, p


def test_m16_tree_levels_scan_not_shuffle_the_corpus(spark, sf_dir):
    """Level-wise tree growth: the level-2 pass scans events ONCE, routes
    rows via the broadcast localCheckpointed 1-row root (nested-loop on a
    single row — never a corpus-sized join), and every join/window runs on
    the <=~88-row sweep aggregate. No sort-merge join anywhere."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import (
        advanced,
    )

    p = _plan(advanced.QUERIES["m16_depth2_tree_trainer"](spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    assert p.count("Scan parquet") == 1, p  # level-2 corpus scan only
    assert "Scan ExistingRDD" in p, p  # checkpointed root winner
    assert "BroadcastNestedLoopJoin" in p, p  # 1-row route frame


def test_l77_postings_probe_broadcasts_query_merges_doclen(spark, sf_dir):
    """The inverted-index probe posture: the 8-term query set broadcasts
    into the tf postings; the corpus-sized doc-length frame honors its
    merge hint (broadcasting it would ship every document's length at
    100 TB); corpus stats ride a 1-row broadcast; ranking partitions by
    query_id (no global single-partition sort of the corpus)."""
    p = _plan(llmops.QUERIES["l77_bm25_topk"](spark, sf_dir))
    assert "SortMergeJoin" in p, p  # dl join keeps the merge hint
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p  # query-term probe


def test_r86_anchor_is_window_not_self_join(spark, sf_dir):
    """The first-seen anchor must be the per-user window min (ONE user_id
    shuffle of the corpus), never an events-to-first-seen self-join (two
    corpus shuffles + a merge); exactly two scans exist — the min-only
    origin stats pass and the matrix pass. The final act/size join runs
    on the checkpointed matrix only and broadcasts — the corpus never
    reappears there."""
    m = _plan(relational3._r86_activity_matrix(spark, sf_dir))
    assert "SortMergeJoin" not in m, m
    assert "BroadcastNestedLoopJoin" in m, m  # 1-row origin
    assert m.count("Scan parquet") == 2, m  # origin stats + matrix pass
    assert m.count("Window") == 1, m
    p = _plan(relational3.QUERIES["r86_cohort_retention"](spark, sf_dir))
    assert "Scan parquet" not in p, p  # matrix-only final step
    assert "Scan ExistingRDD" in p, p
    assert "SortMergeJoin" not in p, p


def test_r87_funnel_is_one_shuffle_three_windows(spark, sf_dir):
    """Funnel depth must not multiply corpus shuffles: the three chained
    conditional first-touch mins share ONE user_id exchange (sort reuse,
    the r71/r83 posture); no self-join of the event log exists. The only
    other exchanges are the tiny distinct/aggregate tail."""
    p = _plan(relational3.QUERIES["r87_funnel_conversion"](spark, sf_dir))
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p
    assert p.count("Window") == 3, p
    assert p.count("Exchange hashpartitioning(user_id") == 1, p


def test_r88_sweepline_is_one_scan_segmented_prefix(spark, sf_dir):
    """The sweep line must read the corpus ONCE (both interval boundaries
    inline via explode, not a two-scan union), collapse it in one bt hash
    aggregate, and run the running sum as the two-level segmented prefix
    (intra-day window + broadcast day-offset join) — never a corpus-sized
    single-partition window or a self-join."""
    d = _plan(relational3._r88_deltas(spark, sf_dir))
    assert d.count("Scan parquet") == 1, d
    assert "Union" not in d, d  # boundaries inline, not a two-scan union
    assert d.count("Exchange hashpartitioning(bt") == 1, d
    p = _plan(relational3.QUERIES["r88_interval_concurrency"](spark, sf_dir))
    assert "Scan parquet" not in p, p  # checkpointed deltas only
    assert "Scan ExistingRDD" in p, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p, p  # day-offset join
    assert p.count("Window") == 2, p  # intra-day run + |days|-row offsets


def test_l78_hard_negatives_broadcast_anchors_salted_topk(spark, sf_dir):
    """Hard-negative mining must broadcast the bounded anchor set against
    ONE full-corpus scan (anchor scans are vec_id<20 pruned reads), rank
    via the two-phase salted top-k (two Window passes, neither
    partitioned corpus-wide by qid alone), and never sort-merge or
    cartesian-join the corpus."""
    p = _plan(llmops.QUERIES["l78_hard_negative_mining"](spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    assert "BroadcastNestedLoopJoin" in p, p  # anchor crossJoin
    assert p.count("Window [") == 2, p  # salted local + global top-k
    import re

    # phase 1 partitions by (qid, salt) — the corpus never lands in a
    # per-qid partition; phase 2's per-qid exchange sees only the
    # qid x salts x k survivors (WindowGroupLimit prunes below it)
    assert re.search(r"hashpartitioning\(qid#\d+L, salt#", p), p
    assert "WindowGroupLimit" in p, p


def test_r91_stats_is_one_exploded_scan(spark, sf_dir):
    """ANALYZE must read the table ONCE: all 11 columns' stats ride a
    single exploded scan with two hash aggregates (per-(col, value)
    partials map-side, then the 11-row reduce) — never one scan per
    column (the oracle's definitional form) and no join or window
    anywhere."""
    p = _plan(relational3.QUERIES["r91_table_stats"](spark, sf_dir))
    assert p.count("Scan parquet") == 1, p
    assert "Join" not in p, p
    assert "Window" not in p, p
    assert "Generate" in p, p  # the explode


def test_r90_audit_is_one_scan_one_shuffle(spark, sf_dir):
    """Seven constraints must cost one lineitem scan and one keyed
    shuffle: the row-local violation counters ride the per-key count
    aggregate (no separate base-aggregate scan), and the only other
    scan is the orders side of the FK anti-join."""
    p = _plan(relational3.QUERIES["r90_quality_audit"](spark, sf_dir))
    # the keyed-partials frame is localCheckpointed: the report plan
    # reads it as an RDD scan; orders is the single parquet scan left
    assert p.count("Scan parquet") == 1, p
    assert "Scan ExistingRDD" in p, p
    kp = _plan(
        relational3.r90_keyed_partials(
            __import__(
                "fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables",
                fromlist=["load_table"],
            ).load_table(spark, sf_dir, "lineitem")
        )
    )
    assert kp.count("Scan parquet") == 1, kp
    assert kp.count("Exchange hashpartitioning(l_orderkey") == 1, kp


def test_m23_scoring_path_is_broadcast_only(spark, sf_dir):
    """Naive Bayes deployment shape: after the (checkpointed) model
    build, scoring must be broadcast hash joins + row-local sums — no
    sort-merge join and no corpus-keyed exchange other than the final
    confusion aggregate."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    p = _plan(advanced.QUERIES["m23_naive_bayes"](spark, sf_dir))
    assert "SortMergeJoin" not in p, p
    assert p.count("BroadcastHashJoin") >= 3, p


def test_m22_ks_has_no_single_partition_window(spark, sf_dir):
    """The ECDF scan must stay distributed: every window in the KS plan
    is partitioned (the two-level segmented scan), never a global
    ORDER BY funneling the value domain into one partition."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    from pyspark.sql import functions as F

    from fraud_detetion_with__kafkastreams_and_grafana_spark.operators.prefix import (
        partitioned_running_sums,
    )
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.advanced import (
        m17_split_seconds,
        m22_ks_counts,
    )
    from fraud_detetion_with__kafkastreams_and_grafana_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    c = m22_ks_counts(ev, m17_split_seconds(spark, sf_dir)).withColumn(
        "blk", F.expr("cent div 4096")
    )
    p = _plan(
        partitioned_running_sums(c, "segment", "blk", "cent",
                                 ["ref_n", "cur_n"])
    )
    specs = [
        line for line in p.splitlines() if "windowspecdefinition(" in line
    ]
    assert specs, p
    for line in specs:
        first_arg = line.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
        # an unpartitioned window's spec STARTS with an ordering
        # expression ("col ASC NULLS FIRST"); partitioned specs start
        # with plain partition column refs
        assert " ASC" not in first_arg and " DESC" not in first_arg, line
    assert "Exchange SinglePartition" not in p, p
    assert "BroadcastHashJoin" in p, p  # the segment-offset join
    assert "SortMergeJoin" not in p, p
    # and the final report plan runs on the checkpointed bounded frame
    q = _plan(advanced.QUERIES["m22_ks_drift"](spark, sf_dir))
    assert "Scan ExistingRDD" in q, q
    assert "SortMergeJoin" not in q, q


def test_r94_sliding_distinct_has_no_nested_loop(spark, sf_dir):
    """The trailing-window membership must be the <=7x explode, never a
    |days| x |activity| range join: no nested-loop or sort-merge join
    exists (the final dau/wau stitch hash-joins two tiny aggregates),
    and the explode is present."""
    p = _plan(relational3.QUERIES["r94_dau_wau"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in p, p
    assert "CartesianProduct" not in p, p
    assert "Generate explode" in p, p


def test_r98_skyline_never_compares_rows(spark, sf_dir):
    """The skyline lowering must stay day-bucketed: one hash exchange
    (the per-day pre-aggregation), the suffix-min window on the bounded
    daily frame only, and NO join that compares corpus rows against
    corpus rows (no sort-merge, no cartesian — the join back is a
    broadcast of the daily map)."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import relational3

    p = _plan(relational3.QUERIES["r98_pareto_skyline"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "BroadcastExchange" in p, p


def test_r99_transitions_one_user_shuffle(spark, sf_dir):
    """The transition matrix must pay exactly ONE hash exchange (the
    user_id shuffle shared by the lead window and the pair counts);
    the totals join broadcasts the |types|-row frame."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import relational3

    p = _plan(relational3.QUERIES["r99_event_transitions"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p, p


def test_m38_bootstrap_replicate_bounded(spark, sf_dir):
    """The Poisson bootstrap must reduce map-side to |types| x B rows:
    no corpus frame under a BroadcastExchange (only the replicate-means
    frame rides one) and no row-vs-row join."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    p = _plan(advanced.QUERIES["m38_bootstrap_ci"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert "SortMergeJoin" not in p, p
    for sub in _subtrees(p, "BroadcastExchange"):
        for k, line in enumerate(sub):
            if "Scan parquet" in line:
                d = _node_indent(line)
                assert any(
                    "HashAggregate" in anc and _node_indent(anc) < d
                    for anc in sub[:k]
                ), f"corpus scan under a broadcast: {line}"


def test_l93_windows_use_segmented_scan(spark, sf_dir):
    """Packed windows must take the two-level segmented scan (per-seg
    window + broadcast offsets), never one corpus-wide ordered window:
    the only single-partition exchange feeds the |segments|-row offset
    frame, which then rides a broadcast."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import llmops as L

    p = _plan(L.QUERIES["l93_packed_windows"](spark, sf_dir))
    assert "CartesianProduct" not in p, p
    assert p.count("Exchange SinglePartition") == 1, p
    assert "BroadcastExchange" in p, p


def test_l100_dup_bigram_is_pure_narrow_projection(spark, sf_dir):
    """The repeated-bigram statistic must compute scan-side: the whole
    plan is scan -> project (per-row transform/array_distinct), zero
    exchanges anywhere."""
    p = _plan(llmops.QUERIES["l100_dup_bigram_rate"](spark, sf_dir))
    assert "Exchange" not in p, p


def test_l98_gopher_single_report_shuffle(spark, sf_dir):
    """Every Gopher rule is a per-row expression; the only exchange in
    the plan is the final (lang, source) report aggregation."""
    p = _plan(llmops.QUERIES["l98_gopher_quality_rules"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p


def test_r106_velocity_one_user_shuffle(spark, sf_dir):
    """The trailing-window count and the per-user rollup must share ONE
    user_id exchange — no self-join anywhere in the velocity rule."""
    p = _plan(relational3.QUERIES["r106_velocity_alerts"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p, p


def test_r109_dormancy_two_frames_one_shuffle(spark, sf_dir):
    """Backward gap (lag) and forward burst (RANGE FOLLOWING) must ride
    the same user_id sort: one exchange, window operators only."""
    p = _plan(relational3.QUERIES["r109_dormancy_reactivation"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p, p


def test_l104_span_corruption_is_shuffle_free(spark, sf_dir):
    """The span transform is row-local array lambdas: zero exchanges,
    zero windows — only counts and a digest leave the scan."""
    p = _plan(llmops.QUERIES["l104_span_corruption"](spark, sf_dir))
    assert "Exchange" not in p, p
    assert "Window" not in p, p


def test_r126_drawdown_windows_share_one_exchange(spark, sf_dir):
    """Running sum + running max + the final keyed agg all ride ONE
    user_id partitioning: two Window operators, one exchange."""
    p = _plan(relational3.QUERIES["r126_max_drawdown"](spark, sf_dir))
    assert p.count("Exchange hashpartitioning") == 1, p
    assert p.count("Window") == 2, p


def test_r129_relaxations_are_equi_joins(spark, sf_dir):
    """Every Bellman-Ford relaxation must be a keyed equi-join; a lost
    join condition (CartesianProduct) would be quadratic in users."""
    p = _plan(relational3.QUERIES["r129_khop_shortest_path"](spark, sf_dir))
    assert "CartesianProduct" not in p, p


def test_l105_l106_vocab_joins_never_cartesian(spark, sf_dir):
    """The pair->unigram / term-marginal joins are vocab-keyed
    equi-joins with no explicit broadcast hint: at toy scale AQE may
    broadcast (fine — it adapts on real sizes), but the equi-condition
    must never degrade to a cross product."""
    for name in ("l105_pmi_collocations", "l106_distinctive_terms"):
        p = _plan(llmops.QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in p, (name, p)


def test_r10_window_plans_no_cartesian_no_python_bnlj_bounded(spark, sf_dir):
    """Blanket scale pin over the whole never-driver-checked backlog
    (the round-10/11/12 windows: m36-m83, l88-l107, r84-r135 — 120
    queries as of the r09 rotation sync): no plan may contain a
    CartesianProduct (unbounded all-pairs), a row-at-a-time
    BatchEvalPython, or a BroadcastNestedLoopJoin whose build subtree
    is not provably bounded (aggregate-rooted, checkpointed RDD,
    reused exchange, or local table). This is the automated version of
    the per-query 'broadcast bound' comments: a refactor that
    cross-joins a corpus-sized raw scan fails here before it ships.
    (Equi-join BroadcastHashJoins are NOT policed: those are Catalyst
    size-threshold choices that auto-revert to shuffle joins at real
    scale.)"""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.registry import (
        _LAST_CHECKED,
        all_queries,
    )

    qs = all_queries()
    window = [
        n for n in qs
        if _LAST_CHECKED.get(n.split("_", 1)[0], 0) == 0
        and not n.startswith("s")  # s-twins EXECUTE on build; their
        # batch plans are pinned via the batch queries they share
    ]
    # The backlog shrinks by ~50/round under the freeze (70 after the
    # r10 sync, ~20 after r11); once it fully drains this sweep is
    # vacuous and the per-query pins take over.
    if not window:
        pytest.skip("driver backlog fully drained — nothing never-checked")
    # Waivers: BNLJ builds bounded by a LITERAL predicate instead of an
    # aggregate — boundedness is in the filter constant, which a plan-
    # string sweep can't prove. Each entry names the bound.
    waived_bnlj = {
        # eval frame is the fixed first-_M55_N_EVAL ids (vec_id < 100)
        "m55_knn_loo_accuracy",
    }
    offenders = {}
    for n in window:
        p = _plan(qs[n](spark, sf_dir))
        marks = [m for m in ("CartesianProduct", "BatchEvalPython") if m in p]
        # Every BNLJ replicates its build side to every task AND cannot
        # fall back to sort-merge at scale the way an equi-join
        # BroadcastHashJoin does — so its build subtree must be provably
        # bounded: rooted in an aggregate (1-row stats / group-count /
        # value-domain-histogram frames), a checkpointed bounded RDD, a
        # reused bounded exchange, or a literal local table. A raw
        # corpus scan here would be the l84-class defect.
        for sub in _subtrees(p, "BroadcastNestedLoopJoin"):
            if n in waived_bnlj:
                continue
            txt = "\n".join(sub)
            if "BroadcastExchange" not in txt and "ReusedExchange" not in txt:
                # A BNLJ subtree with NO visible broadcast node is either
                # a truncated extraction or an unexpected plan form —
                # fail loudly instead of waiving it (r10 verdict task 4).
                marks.append(f"un-attributable BNLJ build: {sub[0].strip()[:90]}")
                continue
            # Scope the bound-keyword scan to the BUILD subtree (the
            # BroadcastExchange/ReusedExchange child), not the whole
            # join text: an Aggregate on the PROBE side must not vouch
            # for an unbounded build (ADVICE r10). A ReusedExchange
            # build is bounded iff the exchange it reuses is — and every
            # originating BroadcastExchange in the plan is itself swept
            # here, so reuse inherits the originator's verdict.
            builds = _subtrees(txt, "BroadcastExchange")
            # Single join over ONE combined list (ADVICE r11): two
            # concatenated joins would fuse the last build line with the
            # first ReusedExchange line, letting a keyword match across
            # the seam.
            build_txt = "\n".join(
                [line for b in builds for line in b]
                + [line for line in txt.splitlines() if "ReusedExchange" in line]
            )
            if builds and not any(
                k in build_txt
                for k in ("Aggregate", "ReusedExchange", "Scan ExistingRDD",
                          "LocalTableScan", "Subquery")
            ):
                marks.append(f"unbounded BNLJ build: {sub[0].strip()[:90]}")
        if marks:
            offenders[n] = marks
    assert not offenders, offenders
