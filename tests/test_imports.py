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
    entries in iteration order. The ROUND-7 window leads with the r6
    hash-red trio (x81/x83/x90 — oracle HUGEINT typing, fixed), then
    every entry with ZERO driver evidence (g10's stale no_oracle, x37,
    the r6 layout family x115-x124, the retrieval/audit family
    x125-x132, and the four by-design rows-only fast paths), then the
    22 operators whose hashed output changed in the r7 ROUND ->
    floor-round migration (their pre-r7 driver rows are stale)."""
    from ask_duckdb_spark.operators import ORACLES, QUERIES

    window = list(QUERIES)[:50]
    must_be_in_window = {
        # r6 red trio — fixed this round, must land green in a DRIVER run
        "x81_token_budget_select",
        "x83_budget_select_cutoff",
        "x90_stratified_budget_select",
        "q1_pricing_summary",  # flagship stays official
        "g10_approx_count_distinct",  # stale r02 no_oracle, oracled r6
        "x37_quantile_sketch",  # never-checked (spot checks; the full
        "x115_snapshot_cdc_diff",  # list is _VERIFY_FIRST itself)
        "x124_affected_partitions",
        "x125_phrase_match",
        "x132_ks_drift",
        "x2f_minhash_neardup_fast",  # rows-only, never driver-recorded
        "x67_bpe_learn",
        "f14_math",  # floor-round migration re-checks
        "q2_min_cost_supplier",
        "x22_tfidf_top_term",
        "x113_char_entropy",
    }
    assert must_be_in_window <= set(window)
    # Window slots must be spent on (a) never-checked/stale rows, or
    # (b) re-checks that are JUSTIFIED: the flagship canary, the fixed
    # red trio, g10's stale row, and the operators whose hashed output
    # the r7 floor-round migration changed.
    import json
    import os

    floor_round_rechecks = {
        "f14_math", "w7_percent_rank_cume", "q2_min_cost_supplier",
        "q20_excess_shipments", "x10_quality_score", "x22_tfidf_top_term",
        "x39_repetition_ratio", "x43_quantize_error", "x64_paragraph_dedup",
        "x65_pq_adc_topk", "x68_repeated_window_spans", "x69_knn_pagerank",
        "x75_hard_negatives", "x79_vocab_growth", "x85_cluster_keep_best",
        "x92_source_calibrated_quality", "x94_retention_cohorts",
        "x101_readability", "x104_value_mad", "x106_ann_tuning_curve",
        "x107_user_ewma", "x113_char_entropy",
    }
    justified = floor_round_rechecks | {
        "q1_pricing_summary",
        "x81_token_budget_select",
        "x83_budget_select_cutoff",
        "x90_stratified_budget_select",
        "g10_approx_count_distinct",
    }
    checked: set[str] = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for r in range(1, 7):
        p = os.path.join(root, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            checked |= set(json.load(open(p)))
    rechecks = [n for n in window if n in checked]
    unjustified = [n for n in rechecks if n not in justified]
    assert not unjustified, unjustified
    # Every window entry carries a full value-hash oracle EXCEPT the
    # four by-design rows-only twins, which have never had any driver
    # record at all and each carry a pytest exact-twin gate.
    rows_only_by_design = {
        "x2f_minhash_neardup_fast", "x4f_simhash_fast",
        "x54_pack_bins_ffd", "x67_bpe_learn",
    }
    no_oracle = {n for n in window if n not in ORACLES}
    assert no_oracle == rows_only_by_design, no_oracle


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
