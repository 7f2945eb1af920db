"""Property-based pin-downs (hypothesis) of the reference's edge semantics.

Each property generates a batch of rows, runs ONE Spark job per example,
and asserts an invariant the reference fixes:
- strict `>` branch disjointness/totality incl. the 10000.0 boundary
  (TransactionProcessor.java:15,39)
- JSON wire roundtrip identity for well-formed records + drop-on-corrupt
  (TransactionProcessor.java:29-37)
- Jaccard bounds/symmetry/identity for the dedup verifiers.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fraud_detetion_with__kafkastreams_and_grafana_spark.operators.dedup import jaccard
from fraud_detetion_with__kafkastreams_and_grafana_spark.operators.detect import (
    branch_fraud,
    parse_wire,
)

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

amounts = st.lists(
    st.floats(
        min_value=0.0, max_value=20000.0, allow_nan=False, allow_infinity=False
    ),
    min_size=1,
    max_size=30,
)


@given(amounts=amounts)
@example(amounts=[10000.0, 10000.0000001, 9999.9999999])
@settings(**_SETTINGS)
def test_branch_is_disjoint_total_strict(spark, amounts):
    df = spark.createDataFrame([(a,) for a in amounts], "amount double")
    fraud, rest = branch_fraud(df)
    f = [r.amount for r in fraud.collect()]
    r = [r.amount for r in rest.collect()]
    assert sorted(f + r) == sorted(amounts)  # total, disjoint partition
    assert all(a > 10000.0 for a in f)  # strict: 10000.0 is NOT fraud
    assert all(a <= 10000.0 for a in r)


wire_records = st.lists(
    st.tuples(
        st.text(
            alphabet=st.characters(whitelist_categories=("L", "N")), min_size=1, max_size=12
        ),
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        st.integers(min_value=0, max_value=2_000_000_000),
    ),
    min_size=1,
    max_size=20,
)


@given(recs=wire_records)
@settings(**_SETTINGS)
def test_wire_roundtrip_identity_and_corrupt_drop(spark, recs):
    wire = [
        (json.dumps({"userId": u, "amount": a, "timestamp": t}),) for u, a, t in recs
    ]
    corrupt = [("{not json",), ("",), ("[1,2,3]",)]
    df = spark.createDataFrame(wire + corrupt, "value string")
    out = parse_wire(df)
    got = sorted((r.userId, r.amount, r.timestamp) for r in out.collect())
    assert got == sorted(recs)  # identity on well-formed, corrupt dropped


token_sets = st.lists(st.integers(min_value=0, max_value=50), min_size=0, max_size=20)


@given(a=token_sets, b=token_sets)
@settings(**_SETTINGS)
def test_jaccard_bounds_symmetry_identity(spark, a, b):
    df = spark.createDataFrame(
        [(sorted(set(a)), sorted(set(b)))], "a array<int>, b array<int>"
    )
    row = df.select(
        jaccard(F.col("a"), F.col("b")).alias("jab"),
        jaccard(F.col("b"), F.col("a")).alias("jba"),
        jaccard(F.col("a"), F.col("a")).alias("jaa"),
    ).first()
    assert 0.0 <= row.jab <= 1.0
    assert abs(row.jab - row.jba) < 1e-12  # symmetric
    if set(a):
        assert abs(row.jaa - 1.0) < 1e-12  # identity
    exact = (
        len(set(a) & set(b)) / len(set(a) | set(b)) if set(a) | set(b) else 0.0
    )
    assert abs(row.jab - exact) < 1e-12


doc_ids = st.lists(
    st.integers(min_value=0, max_value=3_000_000_000), min_size=1, max_size=30, unique=True
)


@given(ids=doc_ids)
@settings(**_SETTINGS)
def test_train_split_total_and_deterministic(spark, ids):
    """l17 semantics: every doc gets exactly ONE split, assignment is a
    pure function of doc_id (stable across runs/orderings), and the
    bucket arithmetic matches the closed form."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.llmops import (
        QUERIES,
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, f"text {i}") for i in ids], "doc_id long, text string"
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        out = {r.doc_id: r.split for r in QUERIES["l17_train_split"](spark, d).collect()}
    assert set(out) == set(ids)  # total: one row per doc
    for i in ids:
        b = (i * 2654435761) % 100
        expect = "train" if b < 80 else ("val" if b < 90 else "test")
        assert out[i] == expect, (i, b)


texts = st.lists(
    st.text(alphabet="ab c", min_size=0, max_size=400), min_size=1, max_size=10
)


@given(ts=texts)
@settings(**_SETTINGS)
def test_doc_chunks_cover_exactly(spark, ts):
    """l18 semantics: chunks tile [0, n_tokens) with stride 48 / window 64
    — starts are i*48, every chunk has 1..64 tokens, the last chunk ends
    exactly at n, and consecutive chunks overlap by 16 (except a shorter
    final chunk)."""
    import os
    import re
    import tempfile

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.llmops import (
        QUERIES,
    )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            list(enumerate(ts)), "doc_id long, text string"
        ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
        rows = QUERIES["l18_doc_chunks"](spark, d).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, t in enumerate(ts):
        stripped = t.strip()
        n = len(re.split(r"\s+", stripped)) if stripped else 0
        chunks = sorted(by_doc.get(doc_id, []), key=lambda r: r.chunk_idx)
        if n == 0:
            assert chunks == []
            continue
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            assert c.start_tok == c.chunk_idx * 48
            assert 1 <= c.n_toks <= 64
        last = chunks[-1]
        assert last.start_tok + last.n_toks == n  # tiles end exactly at n
        # every non-final chunk spans past the next chunk's start (>48
        # tokens), so consecutive chunks genuinely overlap
        assert all(c.n_toks > 48 for c in chunks[:-1])
