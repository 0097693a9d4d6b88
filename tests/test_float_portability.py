"""Gate: no hashed float-aggregate may use raw ROUND (VERDICT r5 §next-2).

The x28b lesson, generalized. Two divergence classes exist between Spark
and DuckDB on hashed float output:

1. ORDER-DEPENDENT ACCUMULATION — ``sum``/``avg``/``stddev``/``corr``/
   ``regr_*``/``quantile`` over doubles accumulate partition-by-
   partition; the last ulp depends on partitioning and host. ROUND
   cannot fix this (the rounded digit itself wobbles): x28b was
   driver-red for three consecutive rounds while green locally.
   Required fix: quantize inputs to an exact integer grid per row and
   aggregate integers (order-independent), or compute from integer
   sufficient statistics.

2. ENGINE ROUND SEMANTICS — Spark rounds the shortest decimal repr of
   the double (BigDecimal HALF_UP), DuckDB rounds the binary value;
   they split on representation-boundary inputs and on -0.0. Required
   fix: the portable floor-round ``floor(x*10^d + 0.5)/10^d``, an
   identical IEEE op sequence on both engines.

This gate bans class-1 statically: any oracle whose ROUND argument
contains an aggregate function fails. (Class 2 over deterministic
scalars is allowed — local bit-exact diffcheck covers it — but every
converted entry uses floor-round anyway.) The allowlist is EMPTY and
should stay empty; a new entry needing an exemption should use the
quantize-then-sum pattern instead (see _util.icents / rev_units and the
TREND_ORACLE docstring in operators/multimodal.py).
"""

from __future__ import annotations

import re

from ask_duckdb_spark.operators import ORACLES

#: Aggregates whose double output is accumulation-order-dependent (or,
#: for quantiles, float-valued) — ROUND over any of these is banned.
_FLOAT_AGGS = (
    r"(sum|avg|mean|stddev\w*|var_\w+|variance|corr|covar_\w+|regr_\w+|"
    r"quantile\w*|median|product|geomean|entropy|skewness|kurtosis)"
)

#: Operators exempted from the gate. KEEP EMPTY — fix the operator with
#: the integer-quantization pattern instead of adding to this list.
ALLOWLIST: frozenset[str] = frozenset()


def _round_over_agg(sql: str) -> list[str]:
    """Balanced-paren scan: every ROUND(...) argument that contains a
    float-aggregate call."""
    hits = []
    for m in re.finditer(r"ROUND\s*\(", sql, re.I):
        i, depth, j = m.end(), 1, m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        arg = sql[i : j - 1]
        if re.search(_FLOAT_AGGS + r"\s*\(", arg, re.I):
            hits.append(" ".join(arg.split())[:80])
    return hits


def test_no_round_over_float_aggregate_in_oracles():
    offenders = {
        name: hits
        for name, sql in ORACLES.items()
        if name not in ALLOWLIST and (hits := _round_over_agg(sql))
    }
    assert not offenders, (
        "Oracle(s) ROUND a float aggregate — the x28b order-dependent "
        "hash class. Rebuild on exact integer sums (quantize per row, "
        f"aggregate BIGINT, close with floor-round): {offenders}"
    )


def test_no_spark_round_over_aggregate_in_sources():
    """Source-side twin: F.round(F.sum/avg/...) in operator modules is
    the same class on the Spark side. String-level scan (the oracles
    gate is the semantic one; this catches the obvious mirror)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "ask_duckdb_spark"
    # Multiline: F.round( ... F.sum( may span lines (black formatting),
    # so scan whole-file text, not lines (a line scan missed x84's
    # wrapped F.round(F.sum(...)) the first time).
    pat = re.compile(
        r"F\.round\s*\(\s*F\.(sum|avg|mean|stddev\w*|var\w*|corr|covar\w*|"
        r"regr_\w+|median|product|percentile\w*)\s*\(",
        re.S,
    )
    offenders = []
    for py in sorted(root.rglob("*.py")):
        text = py.read_text()
        for m in pat.finditer(text):
            ln = text.count("\n", 0, m.start()) + 1
            offenders.append(f"{py.name}:{ln}: {m.group(0)[:60]!r}")
    assert not offenders, (
        "Spark source rounds a float aggregate (x28b class) — use the "
        f"quantize-then-sum pattern: {offenders}"
    )


#: Dyadic decimal literals are exact in binary — ceil over their
#: products cannot split between Spark doubles and DuckDB decimals.
_DYADIC_OK = {"0.5", "0.25", "0.125", "0.75", ".5", ".25"}


def test_no_inexact_float_ceil_in_oracles():
    """Rank/threshold selection must use exact integer arithmetic.

    ``ceil(n * 0.55)`` computes a DIFFERENT rank on the two engines for
    ~2.6% of n (Spark types the literal DOUBLE, DuckDB DECIMAL;
    measured splits at n=100/180/200/...). The portable form is
    ``(n*k + 99) DIV 100`` (see x37/x128). This gate bans ceil over a
    product with a non-dyadic decimal literal in any oracle.

    Scope note: the class is functions that keep DuckDB's DECIMAL
    exact THROUGH arithmetic (ceil/floor/+/*). Percentile PARAMETERS
    (``percentile(col, 0.9)`` / ``quantile_cont(col, 0.9)``) are NOT
    in the class: both engines convert q to the same nearest double
    before interpolating, so g9/g15's non-dyadic q values hash green
    at every SF — do not "fix" them.
    """
    bad: dict[str, list[str]] = {}
    pat = re.compile(
        r"ceil\s*\([^()]*?(?:\*\s*(0?\.\d+)|(0?\.\d+)\s*\*)", re.I
    )
    for name, sql in ORACLES.items():
        for m in pat.finditer(sql):
            lit = m.group(1) or m.group(2)
            if lit not in _DYADIC_OK:
                bad.setdefault(name, []).append(m.group(0))
    assert not bad, (
        f"inexact float-literal ceil in oracle (use (n*k+99)//100): {bad}"
    )
