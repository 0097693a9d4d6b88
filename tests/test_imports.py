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
    entries in iteration order. Rounds 1-3 green-lit the relational
    core, the NL pipeline and the X families, so the round-4 window
    must lead with x28b (round 3's one red row), the flagship, and the
    never-checked dialect surface (TPC-H, subqueries, dates, scalar
    functions, grouping extensions)."""
    from ask_duckdb_spark.operators import QUERIES

    window = list(QUERIES)[:50]
    # ROUND-6 window (rotated after CORRECTNESS_r05 landed 49/50): the
    # rebuilt x28b leads (r3-r5's one red row, now integer-exact), then
    # the flagship canary, then the ENTIRE never-driver-checked
    # oracle-backed tail (x69-x114 + the x74-x99 eval/cluster block),
    # closing with w5/g12 whose pre-rewrite driver rows are stale.
    must_be_in_window = {
        "x28b_user_value_trend_sql",  # r3-r5 FAIL — rebuilt, must re-check
        "q1_pricing_summary",  # flagship stays official
        "x69_knn_pagerank",  # never-checked tail (spot checks; the
        "x74_neardup_eval",  # full list is _VERIFY_FIRST itself)
        "x80_cc_star",
        "x87_ann_recall_eval",
        "x96_leakage_safe_split",
        "x100_event_transitions",
        "x105_embedding_drift",
        "x110_interarrival_percentiles",
        "x114_fk_audit",
        "w5_range_frame",  # rewritten on exact integer sums this round
        "g12_stats_agg",
    }
    assert must_be_in_window <= set(window)
    # the window must spend its slots on never-checked or stale rows:
    # at most a handful of re-checks (canary + rewrites)
    import json
    import os

    checked: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in range(1, 6):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            checked |= set(json.load(open(p)))
    rechecks = [n for n in window if n in checked]
    assert len(rechecks) <= 5, rechecks
    # every window entry must carry a full value-hash oracle — a
    # rows-only slot would spend driver evidence on a weaker check
    from ask_duckdb_spark.operators import ORACLES

    assert all(n in ORACLES for n in window)


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
