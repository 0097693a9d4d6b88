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
    entries in iteration order. The ROUND-8 window leads with the ONLY
    entries that have zero driver evidence — the r7 post-sweep hygiene
    family and census (x133-x137) plus their r8 same-oracle twins
    (x133b/x137b) — then the q1 canary and x126 (pair-domain count
    rewritten structurally in r8), then 41 slots re-verifying the
    OLDEST driver evidence (r02 relational-core rows, unchecked since
    round 2)."""
    import json
    import os

    from ask_duckdb_spark.operators import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    never_checked = {
        "x133_eval_decontam",
        "x133b_eval_decontam_bcast",
        "x134_tokenizer_fertility",
        "x135_charclass_audit",
        "x136_eval_leak_report",
        "x137_knn_clustering_coeff",
        "x137b_triangle_census_graph",
    }
    assert never_checked == set(window[:7])
    justified_rechecks = {"q1_pricing_summary", "x126_fd_audit"}
    assert justified_rechecks <= set(window)
    # Every remaining slot must be spent on the OLDEST driver evidence:
    # its latest CORRECTNESS row must be round 2 (nothing fresher
    # deserves a slot while r02 rows exist).
    latest: dict[str, int] = {}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in range(1, 8):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            for q in json.load(open(p)):
                latest[q] = r
    others = [n for n in window if n not in never_checked | justified_rechecks]
    stale_violations = [n for n in others if latest.get(n) != 2]
    assert not stale_violations, stale_violations
    # Every window entry carries a full value-hash oracle this round
    # (the rows-only fast paths all have r7 driver rows already).
    no_oracle = {n for n in window if n not in ORACLES}
    assert not no_oracle, no_oracle


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
