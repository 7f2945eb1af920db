"""Local replica of the driver's oracle-differential check.

For each registered query: run the Spark plan and the DuckDB oracle SQL on
the same sf directory, then compare row count, column names, and
order-insensitive values (floats with tolerance). Used by tests/ and by
``python -m fraud_detetion_with__kafkastreams_and_grafana_spark.testing``.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

from .schemas import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def _values_match(a, b, rtol: float = 1e-6, atol: float = 1e-6) -> bool:
    import datetime as _dt

    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=rtol, abs_tol=atol)
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        if a is None or b is None or len(a) != len(b):
            return False
        return all(_values_match(x, y, rtol, atol) for x, y in zip(a, b))
    # DATE vs TIMESTAMP drift between Spark/DuckDB pandas conversion is a
    # real type mismatch UNLESS both sides denote the same instant: compare
    # datetime-likes on the timeline, never via str().
    if isinstance(a, (_dt.date, _dt.datetime)) and isinstance(b, (_dt.date, _dt.datetime)):
        return pd.Timestamp(a) == pd.Timestamp(b)
    return bool(a == b)


def _is_null(x) -> bool:
    if x is None or x is pd.NaT or x is pd.NA:
        return True
    return isinstance(x, float) and math.isnan(x)


def _dtype_drift(col: str, sa: pd.Series, sb: pd.Series) -> str | None:
    """Detect int-vs-float dtype drift the driver's value hash rejects.

    The driver hashes Spark and oracle values with their types: oracle
    2006.0 (float64, e.g. from an uncast DuckDB HUGEINT) never hashes
    equal to Spark int 2006 even though ``math.isclose`` passes —
    exactly how s58/m51 shipped red in CORRECTNESS_r09.  One relaxation:
    a nullable integer column materializes as float64-with-NaN in
    pandas on EITHER side, so an int/float pair is only a leak when the
    float side is NaN-free (a genuinely float-typed column) or carries
    a fractional value.
    """
    ka, kb = sa.dtype.kind, sb.dtype.kind
    if ka in "iu" and kb in "iu":
        return None
    if (ka in "iu") != (kb in "iu") and {ka, kb} <= set("iuf"):
        floatcol = sb if ka in "iu" else sa
        finite = floatcol.dropna()
        if floatcol.isna().any() and bool((finite == finite.round()).all()):
            return None  # nullable-int materialization, not a type leak
        return (
            f"int/float dtype drift on '{col}': spark={sa.dtype} "
            f"oracle={sb.dtype} (driver value hash would diverge)"
        )
    # bool-vs-numeric: Python's True == 1 makes this class silent in a
    # value comparison, but the driver hashes typed values — a Spark
    # boolean column against an oracle 0/1 BIGINT (or vice versa)
    # diverges exactly like the s58 int/float case.
    if (ka == "b") != (kb == "b") and {ka, kb} <= set("biuf"):
        return (
            f"bool/numeric dtype drift on '{col}': spark={sa.dtype} "
            f"oracle={sb.dtype} (True==1 passes locally, driver hash differs)"
        )
    # date-vs-timestamp cannot be decided from pandas dtypes alone
    # (Spark DATE materializes as object datetime.date, DuckDB DATE as
    # datetime64 — same logical type, different dtypes), so that class
    # is audited at the LOGICAL level instead: Spark plan schema vs
    # DuckDB DESCRIBE, tests/test_parity_gate.py.
    return None


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = -1
    oracle_rows: int = -1
    mismatches: list = field(default_factory=list)


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> ParityResult:
    sp, od = _canon(spark_pdf.copy()), _canon(oracle_pdf.copy())
    res = ParityResult(name=name, ok=True, spark_rows=len(sp), oracle_rows=len(od))
    if list(sp.columns) != list(od.columns):
        return ParityResult(
            name, False, f"columns differ: spark={list(sp.columns)} oracle={list(od.columns)}",
            len(sp), len(od),
        )
    if len(sp) != len(od):
        return ParityResult(name, False, f"row count {len(sp)} vs {len(od)}", len(sp), len(od))
    for c in sp.columns:
        drift = _dtype_drift(c, sp[c], od[c])
        if drift:
            return ParityResult(name, False, drift, len(sp), len(od))
    for i in range(len(sp)):
        for c in sp.columns:
            a, b = sp.iloc[i][c], od.iloc[i][c]
            if _is_null(a) and _is_null(b):
                continue
            if not _values_match(a, b):
                res.mismatches.append((i, c, a, b))
                if len(res.mismatches) >= 5:
                    res.ok = False
                    res.detail = f"value mismatches (first 5): {res.mismatches}"
                    return res
    if res.mismatches:
        res.ok = False
        res.detail = f"value mismatches: {res.mismatches}"
    return res


def check_query(
    spark: SparkSession,
    con: duckdb.DuckDBPyConnection,
    name: str,
    fn,
    sql: str | None,
    sf_dir: str,
) -> ParityResult:
    sdf = fn(spark, sf_dir)
    spark_pdf = sdf.toPandas()
    if sql is None:
        ok = len(spark_pdf) >= 0
        return ParityResult(name, ok, "rows-only (no oracle)", len(spark_pdf), -1)
    oracle_pdf = con.execute(sql).df()
    return compare_frames(name, spark_pdf, oracle_pdf)


def run_parity(sf_dir: str, only: list[str] | None = None, spark=None) -> list[ParityResult]:
    from .plans.registry import all_oracles, all_queries
    from .session import get_spark

    owns = spark is None
    spark = spark or get_spark("parity-check")
    con = duckdb_conn(sf_dir)
    queries, oracles = all_queries(), all_oracles()
    results = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            results.append(check_query(spark, con, name, fn, oracles.get(name), sf_dir))
        except Exception as e:  # noqa: BLE001 — harness must report, not die
            results.append(ParityResult(name, False, f"EXCEPTION: {e!r}"))
    if owns:
        spark.stop()
    return results


def main() -> int:
    import sys

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    only = sys.argv[1:] or None
    results = run_parity(sf_dir, only)
    bad = 0
    for r in results:
        status = "OK  " if r.ok else "FAIL"
        print(f"{status} {r.name:34s} rows={r.spark_rows}/{r.oracle_rows} {r.detail[:400]}")
        bad += 0 if r.ok else 1
    print(f"{len(results) - bad}/{len(results)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
