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
