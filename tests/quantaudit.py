"""Mechanical boundary-margin audit of every integer-quantization site.

VERDICT r11 task 6: the l102/r112 margin audit must extend to EVERY
oracle that quantizes a value to an integer grid, so a future data
regeneration cannot silently land a drift-exposed value near a rounding
boundary.  Hand-writing margin SQL per query does not scale (134 oracles
carry the recipe), so this module instruments the oracles themselves:

Every ``CAST(<round|floor|ceil>(EXPR [, 0]) AS <int type>)`` site in an
oracle SQL is rewritten so EXPR flows through a DuckDB Arrow UDF that
records the distance of ``abs(EXPR) % 1`` from the relevant boundary
(.5 for round, {0,1} for floor/ceil) and returns EXPR unchanged — the
query's semantics are untouched, so sites inside iterative fixed-point
pipelines (m08/m14 gradient steps) are audited exactly like final-select
sites.  ``side_effects=True`` keeps the optimizer from eliminating the
recorder.

Margin semantics:

- Exact-boundary values (frac bit-exactly .5 / 0) are EXCLUDED from the
  margin and counted separately: a double exactly on the boundary is
  (w.p. 1) the product of exact integer-valued arithmetic, identical on
  both engines, and the rounding policies agree there (Spark round =
  HALF_UP = away from zero; DuckDB round = half away from zero; floor is
  floor).  A DRIFTED value essentially never lands bit-exactly on the
  boundary.
- The drift envelope is self-calibrating: cross-engine drift of a scaled
  value is at most ~|scaled| relative ulps times a compounding factor,
  so the audit requires ``margin > 10 * max_abs * 2**-52 * 128``.
  Calibration: r112's hand-measured envelope (~1e-4 int units at
  max_abs ~3e9) equals this formula's output; BM25's 1e6-scaled scores
  get a proportionally tighter bound instead of a meaningless global
  threshold.
- Queries whose quantized arithmetic is IEEE-deterministic cross-engine
  (only +,-,*,/,sqrt,abs over bit-identical inputs and integer
  aggregates — no libm transcendental anywhere) may be declared EXACT:
  their margins can be arbitrarily small because both engines compute
  the SAME double.  The declaration is mechanically guarded: an
  EXACT-declared oracle must contain no drift token in its entire SQL.

Known limitation (documented, deliberate): order-sensitive SUMs of
non-integer doubles feeding a quantization could exceed the x128
compounding allowance (the s63 centered-Gram counter-case) — the house
recipe therefore quantizes BEFORE summation, s63 stays unquantized, and
the bit-exact cross-engine audits in SCALE.md remain the backstop for
that class.
"""

from __future__ import annotations

import re

import numpy as np

_SITE = re.compile(r"CAST\s*\(\s*(round|floor|ceil|ceiling)\s*\(", re.IGNORECASE)
_INT_TARGET = re.compile(
    r"^\s*(?:,[^)]*)?\)\s*AS\s+(BIGINT|INTEGER|INT|SMALLINT|TINYINT|HUGEINT)\s*\)",
    re.IGNORECASE | re.DOTALL,
)
# sqrt/cbrt are IEEE-754 correctly rounded (cross-engine deterministic);
# only libm transcendentals carry engine-dependent drift.
DRIFT_TOKEN = re.compile(
    r"\b(ln|log|log2|log10|exp|power|pow|sin|cos|tan|atan2?|asin|acos|tanh)\s*\(",
    re.IGNORECASE,
)


def _first_arg_end(sql: str, start: int) -> int:
    """Index just past EXPR (first arg), given start = index after '('.
    Ends at a top-level ',' or the function's ')'."""
    depth, i, n = 1, start, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        elif ch == "," and depth == 1:
            return i
        i += 1
    raise ValueError("unbalanced parens in oracle SQL")


def instrument(sql: str) -> tuple[str, int, int]:
    """Wrap every integer-target CAST(round/floor/ceil(EXPR ...)) site's
    EXPR in qm_round(...) / qm_floor(...). Returns (sql', n_round, n_floor)."""
    out: list[str] = []
    pos = n_round = n_floor = 0
    while True:
        m = _SITE.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            break
        func = m.group(1).lower()
        arg_start = m.end()
        arg_end = _first_arg_end(sql, arg_start)
        close = arg_end
        if sql[close] == ",":  # skip the precision arg to the func's ')'
            depth, i = 1, close
            while depth:
                i += 1
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
            close = i
        if not _INT_TARGET.match(sql[close:]):
            out.append(sql[pos:m.end()])
            pos = m.end()
            continue
        wrapper = "qm_round" if func == "round" else "qm_floor"
        if func == "round":
            n_round += 1
        else:
            n_floor += 1
        out.append(sql[pos:arg_start])
        out.append(f"{wrapper}(CAST(")
        # recurse: a quantization site nested inside this EXPR must be
        # instrumented too, not copied through verbatim
        inner, ir, inner_f = instrument(sql[arg_start:arg_end])
        n_round += ir
        n_floor += inner_f
        out.append(inner)
        out.append(" AS DOUBLE))")
        pos = arg_end
    return "".join(out), n_round, n_floor


class _Recorder:
    """min margin / max |scaled value| / exact-boundary count per class."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.min_margin = {"round": np.inf, "floor": np.inf}
        self.max_abs = {"round": 0.0, "floor": 0.0}
        self.n_exact = {"round": 0, "floor": 0}

    def _record(self, kind: str, x: np.ndarray, dist: np.ndarray) -> None:
        exact = dist == 0.0
        self.n_exact[kind] += int(np.count_nonzero(exact))
        live = dist[~exact]
        if len(live):
            self.min_margin[kind] = min(self.min_margin[kind], float(np.min(live)))
        if len(x):
            self.max_abs[kind] = max(self.max_abs[kind], float(np.max(np.abs(x))))

    def qm_round(self, a):
        x = a.to_numpy(zero_copy_only=False)
        x = x[np.isfinite(x)]
        if len(x):
            self._record("round", x, np.abs(np.abs(x) % 1.0 - 0.5))
        return a

    def qm_floor(self, a):
        x = a.to_numpy(zero_copy_only=False)
        x = x[np.isfinite(x)]
        if len(x):
            frac = np.abs(x) % 1.0
            self._record("floor", x, np.minimum(frac, 1.0 - frac))
        return a


def envelope(max_abs: float) -> float:
    """Estimated cross-engine drift of a scaled value, in integer units:
    relative 1-ulp libm divergence compounded across <=128 operations."""
    return max_abs * 2.0**-52 * 128


def audit(sf_dir: str, oracles: dict[str, str]) -> dict[str, dict]:
    """Run every quantization-bearing oracle with recording UDFs.

    Returns {name: {n_round, n_floor, min_margin, max_abs, n_exact, err}}.
    """
    import duckdb
    from duckdb.functional import PythonUDFType

    from fraud_detetion_with__kafkastreams_and_grafana_spark import testing

    rec = _Recorder()
    con = testing.duckdb_conn(sf_dir)
    for name, fn in (("qm_round", rec.qm_round), ("qm_floor", rec.qm_floor)):
        con.create_function(
            name, fn, [duckdb.typing.DOUBLE], duckdb.typing.DOUBLE,
            type=PythonUDFType.ARROW, side_effects=True,
        )
    results: dict[str, dict] = {}
    for name, sql in oracles.items():
        new_sql, n_round, n_floor = instrument(sql)
        if not n_round and not n_floor:
            continue
        rec.reset()
        err = ""
        try:
            con.execute(new_sql).fetchall()
        except Exception as e:  # noqa: BLE001 — audit must report, not die
            err = repr(e)[:200]
        results[name] = {
            "n_round": n_round,
            "n_floor": n_floor,
            "min_margin": dict(rec.min_margin),
            "max_abs": dict(rec.max_abs),
            "n_exact": dict(rec.n_exact),
            "err": err,
        }
    con.close()
    return results
