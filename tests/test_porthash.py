"""Cross-engine equality gates for functions/porthash.py.

The entire round-4 oracle story (x2/x4/x4b/x6/x7b/x44/x24/x29/x27/
x62/x38) rests on Spark and DuckDB computing the SAME hash values.
These tests pin that property directly, token by token, so a future
change to either side's expression (or an engine upgrade changing
md5/conv/strpos semantics) fails here first — not as an opaque
value-hash mismatch in the driver's correctness run.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ask_duckdb_spark.functions.porthash import (
    PH_B,
    PH_P,
    perm_constants,
    token_hash60,
    token_hash60_sql,
)

#: Adversarial token sample: ascii, unicode (UTF-8 multibyte), digits,
#: punctuation-heavy, long, and single-char strings.
TOKENS = [
    "hello",
    "the",
    "naïve",
    "héllo",
    "日本語",
    "🚀rocket",
    "x",
    "0",
    "a-b_c.d/e",
    "averyveryverylongtokenthatkeepsongoingandgoing" * 4,
    "MiXeD",
    "ß",
]


def _duck_hashes(vals: list[str]) -> list[int]:
    # Explicit index + ORDER BY (ADVICE r4): VALUES rows have no
    # guaranteed scan order, so positional zipping against the input
    # list would flake under any plan change.
    con = duckdb.connect()
    rows = ", ".join(f"({i}, ?)" for i in range(len(vals)))
    q = (
        f"SELECT {token_hash60_sql('t')} FROM (VALUES {rows}) v(i, t) "
        "ORDER BY i"
    )
    return [r[0] for r in con.sql(q, params=vals).fetchall()]


def test_token_hash60_matches_duckdb(spark):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TOKENS)], ["i", "t"]
    )
    got = [
        r[1]
        for r in sorted(
            sdf.select("i", token_hash60(F.col("t"))).collect()
        )
    ]
    assert got == _duck_hashes(TOKENS)


def test_token_hash60_range():
    # 15 hex chars => always in [0, 2^60): safe for mod-p products
    for h in _duck_hashes(TOKENS):
        assert 0 <= h < 1 << 60


def test_perm_constants_are_valid_multipliers():
    perms = perm_constants(64)
    assert len(set(perms)) == 64  # distinct permutations
    for a, b in perms:
        assert 0 < a < PH_P  # never a degenerate multiplier
        assert 0 <= b < PH_P
        # product bound: (P-1) * a + b stays far below 2^63 on both
        # engines (DuckDB raises on BIGINT overflow, Spark would wrap)
        assert (PH_P - 1) * a + b < 1 << 63


def test_modp_fold_matches_duckdb(spark):
    """The shingle fold (acc * B + x) % P over token hashes — the exact
    expression pair x2's oracle generates — agrees engine-to-engine."""
    con = duckdb.connect()
    duck = con.sql(
        f"""
        SELECT list_reduce(
          list_transform(['a', 'b', 'c'], t -> {token_hash60_sql('t')} % {PH_P}),
          (a, b) -> (a * {PH_B} + b) % {PH_P})
        """
    ).fetchone()[0]
    sdf = spark.range(1).select(
        F.aggregate(
            F.transform(
                F.array(F.lit("a"), F.lit("b"), F.lit("c")),
                lambda t: token_hash60(t) % PH_P,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * PH_B + x) % PH_P,
        ).alias("h")
    )
    assert sdf.collect()[0][0] == duck


@pytest.mark.parametrize("token", ["hello", "日本語", "🚀rocket"])
def test_utf8_multibyte_hashing_is_bytewise(token):
    """md5 must see UTF-8 bytes identically in both engines (a latin-1
    or UTF-16 divergence would silently skew every sketch)."""
    import hashlib

    expected = int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)
    assert _duck_hashes([token])[0] == expected
