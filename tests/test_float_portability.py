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


def test_no_round_at_all_in_oracles():
    """Class-2 total ban (VERDICT r6 item 4): EVERY hashed ROUND over a
    float expression is a latent engine split — Spark rounds the
    shortest-decimal repr HALF_UP, DuckDB rounds the binary value —
    that bites data-dependently on representation-boundary inputs. All
    former ROUND sites now use the portable floor-round
    ``floor(x*10^d + 0.5)/10^d`` (_util.floor_round/_sql), so the
    oracle corpus must contain NO round() call of any arity. The
    allowlist is shared with the aggregate gate and must stay empty."""
    pat = re.compile(r"\bround\s*\(", re.I)
    offenders = {
        name: [
            " ".join(sql[m.start() : m.start() + 60].split())
            for m in pat.finditer(sql)
        ]
        for name, sql in ORACLES.items()
        if name not in ALLOWLIST and pat.search(sql)
    }
    assert not offenders, (
        "round() in oracle SQL — use _util.floor_round_sql (portable "
        f"half-up, identical IEEE sequence on both engines): {offenders}"
    )


def test_no_spark_round_in_operator_sources():
    """Spark-side twin of the total ban: no F.round anywhere in the
    operator/function/streaming modules (the hashed-output surface).
    Display-edge code (introspect/CLI) may round for humans."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parent.parent / "ask_duckdb_spark"
    offenders = []
    for sub in ("operators", "functions", "streaming"):
        for py in sorted((root / sub).rglob("*.py")):
            text = py.read_text()
            for m in re.finditer(r"F\.round\s*\(", text):
                ln = text.count("\n", 0, m.start()) + 1
                offenders.append(f"{sub}/{py.name}:{ln}")
    assert not offenders, (
        f"F.round in hashed-output source — use _util.floor_round: {offenders}"
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


#: Dyadic decimal literals (m / 2^k) are exact in binary — ceil over
#: their products/quotients cannot split between Spark doubles and
#: DuckDB decimals. (For division the LITERAL being dyadic is only safe
#: when it is a power of two, so the quotient stays dyadic; 2.0/4.0 are
#: listed, 0.75 deliberately is not valid as a divisor — but the gate
#: keys on the literal alone, so keep divisor-only-safe values out.)
_DYADIC_OK = {"0.5", "0.25", "0.125", "0.75", ".5", ".25"}
_POW2_DIVISOR_OK = {"0.5", ".5", "0.25", ".25", "0.125", "2.0", "4.0", "8.0"}


def _balanced_arg(sql: str, start: int) -> str:
    """Return the balanced-paren argument text beginning at ``start``
    (index just past the opening paren)."""
    depth, j = 1, start
    while j < len(sql) and depth:
        if sql[j] == "(":
            depth += 1
        elif sql[j] == ")":
            depth -= 1
        j += 1
    return sql[start : j - 1]


def test_no_inexact_float_ceil_in_oracles():
    """Rank/threshold selection must use exact integer arithmetic.

    ``ceil(n * 0.55)`` computes a DIFFERENT rank on the two engines for
    ~2.6% of n (Spark types the literal DOUBLE, DuckDB DECIMAL;
    measured splits at n=100/180/200/...). The portable form is
    ``(n*k + 99) DIV 100`` (see x37/x128). This gate bans, in any
    oracle, ceil over an argument that multiplies by a non-dyadic
    decimal literal OR divides by a decimal literal that is not a power
    of two — ``ceil(n / 20.0)`` is the same class (DuckDB divides in
    DECIMAL, Spark in binary double). The ceil argument is extracted
    with a balanced-paren scan so parenthesized operands like
    ``ceil((n + 1) * 0.55)`` cannot escape the gate.

    Scope note: the class is functions that keep DuckDB's DECIMAL
    exact THROUGH arithmetic (ceil/floor/+/*). Percentile PARAMETERS
    (``percentile(col, 0.9)`` / ``quantile_cont(col, 0.9)``) are NOT
    in the class: both engines convert q to the same nearest double
    before interpolating, so g9/g15's non-dyadic q values hash green
    at every SF — do not "fix" them.
    """
    bad: dict[str, list[str]] = {}
    lit = r"(?:\d+\.\d*|\.\d+)"
    mul_pat = re.compile(rf"\*\s*({lit})|({lit})\s*\*")
    div_pat = re.compile(rf"/\s*({lit})")
    for name, sql in ORACLES.items():
        for m in re.finditer(r"ceil\s*\(", sql, re.I):
            arg = _balanced_arg(sql, m.end())
            for mm in mul_pat.finditer(arg):
                v = mm.group(1) or mm.group(2)
                if v not in _DYADIC_OK:
                    bad.setdefault(name, []).append(f"mul {v!r} in ceil({arg[:60]}")
            for mm in div_pat.finditer(arg):
                if mm.group(1) not in _POW2_DIVISOR_OK:
                    bad.setdefault(name, []).append(
                        f"div {mm.group(1)!r} in ceil({arg[:60]}"
                    )
    assert not bad, (
        f"inexact float-literal ceil in oracle (use (n*k+99)//100): {bad}"
    )


def test_ceil_gate_catches_paren_and_division_forms():
    """Regression for the gate itself (ADVICE r6): parenthesized
    operands and decimal-literal division must not escape."""
    lit = r"(?:\d+\.\d*|\.\d+)"
    mul_pat = re.compile(rf"\*\s*({lit})|({lit})\s*\*")
    div_pat = re.compile(rf"/\s*({lit})")

    def hits(sql: str) -> bool:
        for m in re.finditer(r"ceil\s*\(", sql, re.I):
            arg = _balanced_arg(sql, m.end())
            for mm in mul_pat.finditer(arg):
                if (mm.group(1) or mm.group(2)) not in _DYADIC_OK:
                    return True
            for mm in div_pat.finditer(arg):
                if mm.group(1) not in _POW2_DIVISOR_OK:
                    return True
        return False

    assert hits("SELECT ceil((n + 1) * 0.55) FROM t")
    assert hits("SELECT ceil(n / 20.0) FROM t")
    assert hits("SELECT ceil(0.55 * (n + 1)) FROM t")
    assert not hits("SELECT ceil(n * 0.5) FROM t")
    assert not hits("SELECT ceil(n / 2.0) FROM t")
    assert not hits("SELECT ceil((n * 55 + 99) // 100) FROM t")
