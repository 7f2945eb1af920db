"""Guards on the local parity gate itself (VERDICT r9 tasks 2 & 6).

Round 9 shipped s58/m51 driver-red because the shared oracle computed
``min(n)`` over a DuckDB HUGEINT sum: pandas materialized the column as
float64, the driver's typed value hash diverged, and the local gate —
value-tolerant, dtype-blind — passed anyway.  These tests pin the two
defenses that close that class:

1. ``testing._dtype_drift`` red-flags int-vs-float column pairs (the
   strict gate every parity test now runs through), with the one sound
   relaxation for nullable-int → float64-with-NaN materialization.
2. A registry-wide DESCRIBE sweep rejects any oracle emitting a
   HUGEINT/UHUGEINT column (DuckDB ``sum(BIGINT)`` uncast — the exact
   m51 slip), and doubles as a bind-time syntax check on all 422 SQLs.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

import conftest

from fraud_detetion_with__kafkastreams_and_grafana_spark import testing
from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.registry import all_oracles


def test_strict_gate_catches_the_s58_defect_shape():
    # Oracle float64 2006.0 vs Spark int64 2006: value-identical, the
    # pre-round-10 gate passed it, the driver hash rejected it.
    spark_pdf = pd.DataFrame({"event_type": ["a"], "n": np.array([2006], dtype="int64")})
    oracle_pdf = pd.DataFrame({"event_type": ["a"], "n": np.array([2006.0])})
    res = testing.compare_frames("s58_shape", spark_pdf, oracle_pdf)
    assert not res.ok
    assert "dtype drift" in res.detail and "'n'" in res.detail


def test_strict_gate_symmetric_spark_float_vs_oracle_int():
    spark_pdf = pd.DataFrame({"k": [1], "v": np.array([3.0])})
    oracle_pdf = pd.DataFrame({"k": [1], "v": np.array([3], dtype="int64")})
    res = testing.compare_frames("sym", spark_pdf, oracle_pdf)
    assert not res.ok and "dtype drift" in res.detail


def test_strict_gate_allows_nullable_int_materialization():
    # An int column with NULLs arrives as float64-with-NaN from either
    # engine's pandas conversion — same driver-side canonical type, not
    # a leak.
    spark_pdf = pd.DataFrame({"k": [1, 2], "v": np.array([3.0, np.nan])})
    oracle_pdf = pd.DataFrame({"k": [1, 2], "v": pd.array([3, None], dtype="Int64")})
    res = testing.compare_frames("nullable", spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_strict_gate_still_flags_fractional_float_vs_int():
    spark_pdf = pd.DataFrame({"v": np.array([3], dtype="int64")})
    oracle_pdf = pd.DataFrame({"v": np.array([3.5])})
    res = testing.compare_frames("frac", spark_pdf, oracle_pdf)
    assert not res.ok


def test_strict_gate_int_widths_are_compatible():
    spark_pdf = pd.DataFrame({"v": np.array([3], dtype="int32")})
    oracle_pdf = pd.DataFrame({"v": np.array([3], dtype="int64")})
    res = testing.compare_frames("widths", spark_pdf, oracle_pdf)
    assert res.ok, res.detail


def test_strict_gate_float_float_untouched():
    spark_pdf = pd.DataFrame({"v": np.array([3.25], dtype="float32")})
    oracle_pdf = pd.DataFrame({"v": np.array([3.25])})
    res = testing.compare_frames("ff", spark_pdf, oracle_pdf)
    assert res.ok, res.detail


# ---------------------------------------------------------------------------
# Registry-wide oracle type sweep — bind-only (DESCRIBE), no execution.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = testing.duckdb_conn(sf_dir)
    yield con
    con.close()


def test_no_oracle_emits_hugeint(duck):
    offenders = []
    for name, sql in all_oracles().items():
        for col, typ, *_ in duck.execute(f"DESCRIBE ({sql})").fetchall():
            if "HUGEINT" in typ.upper():
                offenders.append((name, col, typ))
    assert not offenders, (
        "uncast DuckDB aggregate (HUGEINT materializes as float64 in "
        f"pandas; driver hash diverges from Spark ints): {offenders}"
    )


def test_strict_gate_catches_the_actual_r09_defect_end_to_end(spark, duck, sf_dir):
    """Run the REAL m51 Spark plan against the PRE-round-10 oracle text
    (min(n) uncast → HUGEINT → float64) and assert the strict gate
    red-flags it — the exact end-to-end path that shipped s58 driver-red
    in CORRECTNESS_r09 — then that the shipped (cast) oracle passes."""
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans import advanced

    fixed_sql = advanced.ORACLES["m51_tukey_fences"]
    assert "CAST(min(n) AS BIGINT)" in fixed_sql
    broken_sql = fixed_sql.replace("CAST(min(n) AS BIGINT) AS n", "min(n) AS n")
    assert broken_sql != fixed_sql

    spark_pdf = advanced.QUERIES["m51_tukey_fences"](spark, sf_dir).toPandas()
    broken = testing.compare_frames(
        "m51_broken_oracle", spark_pdf, duck.execute(broken_sql).df()
    )
    assert not broken.ok and "dtype drift" in broken.detail, broken.detail
    fixed = testing.compare_frames(
        "m51_fixed_oracle", spark_pdf, duck.execute(fixed_sql).df()
    )
    assert fixed.ok, fixed.detail


def test_strict_gate_flags_bool_vs_int():
    # Python's True == 1 makes this silent in value comparison; the
    # driver hashes typed values and diverges.
    spark_pdf = pd.DataFrame({"flag": np.array([True, False])})
    oracle_pdf = pd.DataFrame({"flag": np.array([1, 0], dtype="int64")})
    res = testing.compare_frames("bool_int", spark_pdf, oracle_pdf)
    assert not res.ok and "bool/numeric dtype drift" in res.detail


def test_strict_gate_bool_bool_untouched():
    spark_pdf = pd.DataFrame({"flag": np.array([True, False])})
    oracle_pdf = pd.DataFrame({"flag": np.array([True, False])})
    assert testing.compare_frames("bool_bool", spark_pdf, oracle_pdf).ok


def test_logical_types_agree_bool_date_ts(spark, duck, sf_dir):
    """Bind-level audit of the type classes the materialized gate can't
    decide from pandas dtypes: for every BATCH oracle emitting BOOLEAN /
    DATE / TIMESTAMP columns, the Spark plan schema must agree — except
    the one driver-proven-safe direction, Spark TIMESTAMP vs oracle DATE
    (both materialize datetime64; r19/r45 hash-green in CORRECTNESS
    r01/r03/r05/r07). Spark DATE vs oracle TIMESTAMP would diverge
    (object datetime.date vs datetime64) and fails here. s-twins are
    excluded (they execute streams on build) — each shares a batch
    query's oracle, so the batch row covers the contract."""
    import pyspark.sql.types as T

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.registry import all_queries

    qs = all_queries()

    def scls(t):
        if isinstance(t, T.BooleanType):
            return "bool"
        if isinstance(t, T.DateType):
            return "date"
        if isinstance(t, (T.TimestampType, T.TimestampNTZType)):
            return "ts"
        return "other"

    def dclsname(t):
        u = t.upper()
        if u == "BOOLEAN":
            return "bool"
        if u == "DATE":
            return "date"
        if u.startswith("TIMESTAMP"):
            return "ts"
        return "other"

    bad = []
    for name, sql in all_oracles().items():
        if name.startswith("s"):
            continue
        od = {
            c: dclsname(t)
            for c, t, *_ in duck.execute(f"DESCRIBE ({sql})").fetchall()
            if dclsname(t) != "other"
        }
        if not od:
            continue
        sd = {f.name: scls(f.dataType) for f in qs[name](spark, sf_dir).schema.fields}
        for c, oc in od.items():
            sc = sd.get(c, "missing")
            if sc == oc:
                continue
            if sc == "ts" and oc == "date":
                continue  # driver-proven-safe direction
            bad.append((name, c, f"spark={sc} oracle={oc}"))
    assert not bad, bad


def test_quantized_transcendentals_clear_rounding_boundaries():
    """The integer-quantized transcendental outputs (r112 nano-nat
    entropy; l102/s63 nano components + micro Rayleigh) hash exactly
    across engines ONLY if no raw scaled value sits near a .5 rounding
    boundary: cross-engine libm/summation drift moves the scaled double
    by up to ~1e-4 integer units (round-10 bit-exact audit), so a value
    inside that band could round in opposite directions. Audit the
    ACTUAL data at every test SF: minimum distance from .5 must exceed
    the drift envelope by >=10x (r10 VERDICT task 3 / ADVICE r112).
    DuckDB-only is sufficient — both engines sit within the drift of
    the same true value, so one side's margin bounds the other's."""
    import duckdb

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.llmops import _L102_SQL
    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.relational3 import _R112_SQL

    l102_inner = _L102_SQL[: _L102_SQL.rindex("SELECT")]
    l102_margin = l102_inner + """
        SELECT min(abs(abs(v3.v * 1000000000.0) % 1 - 0.5)) AS comp_margin,
               min(abs(abs(ray.lam * 1000000.0) % 1 - 0.5)) AS ray_margin
        FROM v3, ray"""
    r112_inner = _R112_SQL[: _R112_SQL.rindex("SELECT")]
    r112_margin = r112_inner + """
        SELECT min(abs(abs((ln(CAST(n AS DOUBLE)) - slc / n)
                           * 1000000000.0) % 1 - 0.5)) AS ent_margin
        FROM u"""

    # Audit every generated SF, anchored on the conftest override (ADVICE
    # r11): hosts without a given sf dir skip that point instead of
    # erroring — the margin claim is per-dataset, not per-host.
    candidates = dict.fromkeys(
        [conftest.SF_DIR, conftest.SF_DIR_MEDIUM]
        + [f"{os.path.dirname(conftest.SF_DIR_MEDIUM)}/sf0.1"]
    )
    dirs = [d for d in candidates if os.path.isdir(d)]
    if not dirs:
        pytest.skip("no generated SF dirs on this host")
    for sf in dirs:
        con = testing.duckdb_conn(sf)
        comp, ray = con.execute(l102_margin).fetchone()
        (ent,) = con.execute(r112_margin).fetchone()
        con.close()
        # measured at HEAD: comp >= 1.19e-3, ray >= 2.4e-2, ent >= 1.33e-3
        assert comp > 1e-4, (sf, "l102 component margin", comp)
        assert ray > 1e-3, (sf, "l102 rayleigh margin", ray)
        assert ent > 1e-3, (sf, "r112 entropy margin", ent)


# Queries whose quantized arithmetic is IEEE-deterministic cross-engine
# (VERDICT r11 task 6): only +,-,*,/,abs over bit-identical parquet
# inputs and integer aggregates — the rational-sigmoid fixed-point
# recipe. Both engines compute the SAME double at every site, so the
# margin may be arbitrarily small; mechanically guarded below by
# requiring the whole oracle SQL to be free of libm drift tokens.
_QUANT_EXACT = {
    "m08_gd_trained_scorer":
        "fixed-point GD: rational sigmoid z/(1+abs(z)); gradients "
        "quantized to BIGINT before summation; weights exact rationals",
    "m14_pairwise_preference_trainer":
        "same fixed-point recipe as m08 over pairwise deltas",
    "m31_brier_decomposition":
        "rational sigmoid quantized to BIGINT pm immediately; every "
        "aggregate is an integer sum; later sites divide exact integers",
}


def test_every_quantized_output_clears_its_boundary_envelope():
    """Registry-wide extension of the l102/r112 margin audit (VERDICT
    r11 task 6): mechanically instrument EVERY integer-quantization
    site in every oracle (tests/quantaudit.py rewrites the EXPR through
    a recording UDF) and assert the observed boundary margin exceeds
    10x the self-calibrated drift envelope max_abs * 2^-52 * 128 —
    r112's hand-measured ~1e-4 envelope at max_abs ~3e9 reproduces this
    formula, and 1e6-scaled sites (BM25 et al.) get a proportionally
    tighter bound instead of a meaningless global threshold. A future
    data regeneration that parks a drift-exposed value near a boundary
    fails here instead of shipping driver-red. sf0.1 joins the audit
    under SPARK_GRAFT_ROUND_CLOSE=1 (it costs ~8 min alone)."""
    import quantaudit

    oracles = all_oracles()
    candidates = dict.fromkeys(
        [conftest.SF_DIR, conftest.SF_DIR_MEDIUM]
        + (
            [f"{os.path.dirname(conftest.SF_DIR_MEDIUM)}/sf0.1"]
            if os.environ.get("SPARK_GRAFT_ROUND_CLOSE") == "1"
            else []
        )
    )
    dirs = [d for d in candidates if os.path.isdir(d)]
    if not dirs:
        pytest.skip("no generated SF dirs on this host")
    for sf in dirs:
        results = quantaudit.audit(sf, oracles)
        # the recipe is pervasive — a scan that stops finding it means
        # the instrumentation regressed, not that quantization vanished
        assert len(results) > 100, (sf, len(results))
        bad = []
        for name, r in sorted(results.items()):
            if r["err"]:
                bad.append((name, "audit error", r["err"]))
                continue
            if name in _QUANT_EXACT:
                if quantaudit.DRIFT_TOKEN.search(oracles[name]):
                    bad.append((name, "declared EXACT but oracle has a "
                                      "libm drift token"))
                continue
            for kind, n_sites in (("round", r["n_round"]), ("floor", r["n_floor"])):
                if not n_sites:
                    continue
                margin = r["min_margin"][kind]
                if margin == float("inf"):
                    # every observed value sat bit-exactly ON the
                    # boundary: exact integer-valued arithmetic, both
                    # engines agree by policy (see quantaudit docstring)
                    continue
                bound = 10 * quantaudit.envelope(r["max_abs"][kind])
                if not margin > bound:
                    bad.append((name, kind, f"margin {margin:.3e} <= "
                               f"10x envelope {bound:.3e} "
                               f"(max_abs {r['max_abs'][kind]:.2e})"))
        assert not bad, (sf, bad)
    stale = set(_QUANT_EXACT) - set(results)
    assert not stale, f"stale _QUANT_EXACT entries (no sites found): {stale}"


def test_logical_types_agree_int_float(spark, duck, sf_dir):
    """Bind-level audit of the int-vs-float logical class (ADVICE r10):
    the materialized gate's nullable-int relaxation passes any int
    column whose float side is NaN-carrying and integral, so an
    s58-class type leak on a column that happens to contain NULLs is
    invisible to it. Here the Spark plan schema's integral/floating
    class must match DuckDB's DESCRIBE class for every batch oracle —
    no NULL blind spot, because declared types don't depend on the
    data. HUGEINT is classed integral (a dedicated sweep already bans
    it). DECIMAL is classed floating: duckdb .df() materializes it
    float64, which is what the driver hashes."""
    import pyspark.sql.types as T

    from fraud_detetion_with__kafkastreams_and_grafana_spark.plans.registry import all_queries

    qs = all_queries()

    def scls(t):
        if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return "int"
        if isinstance(t, (T.FloatType, T.DoubleType)):
            return "float"
        # DecimalType is deliberately "other" (ADVICE r11): Spark
        # toPandas materializes decimals as object(decimal.Decimal),
        # NOT float64, so a DecimalType column would hash differently
        # from a DuckDB DECIMAL (which .df() materializes float64)
        # even though both are "decimal". Classing it other forces
        # every plan to cast to double explicitly; the materialized
        # dtype-strict gate remains the backstop.
        return "other"

    def dcls(t):
        u = t.upper()
        if u in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
                 "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
            return "int"
        if u in ("FLOAT", "DOUBLE", "REAL") or u.startswith("DECIMAL"):
            return "float"
        return "other"

    bad = []
    for name, sql in all_oracles().items():
        if name.startswith("s"):
            continue
        od = {
            c: dcls(t)
            for c, t, *_ in duck.execute(f"DESCRIBE ({sql})").fetchall()
            if dcls(t) != "other"
        }
        if not od:
            continue
        sd = {f.name: scls(f.dataType) for f in qs[name](spark, sf_dir).schema.fields}
        for c, oc in od.items():
            sc = sd.get(c, "missing")
            if sc != oc:
                bad.append((name, c, f"spark={sc} oracle={oc}"))
    assert not bad, bad
