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
    # ROUND-5 window (rotated after CORRECTNESS_r04 landed the r4 list
    # green): the three fixed red rows lead, then the portable-hash
    # flagships, SemDeDup, and the never-checked relational/x tail.
    must_be_in_window = {
        "x28b_user_value_trend_sql",  # r3/r4 FAIL — fixed, must re-check
        "f20_array_agg_sorted",  # r4 harness err — serialized, re-check
        "f21_map_functions",
        "q1_pricing_summary",  # flagship stays official
        "x2_minhash_neardup",  # stale-err flagships (VERDICT r4 item 4)
        "x6_ann_lsh_topk",
        "x7b_embedding_neardup_lsh",
        "x62_semdedup",  # never driver-checked pair
        "x63_semdedup_hier",
        "so6_union_by_name",  # never-checked relational tail
        "w8_forward_fill",
        "j11_fuzzy_name_join",
        "nl6_duckdb_dialect_passthrough",
        "x57_bigram_rarity",  # never-checked x block
        "x68_repeated_window_spans",
    }
    assert must_be_in_window <= set(window)
    # every window entry must carry a full value-hash oracle — a
    # rows-only slot would spend driver evidence on a weaker check
    from ask_duckdb_spark.operators import ORACLES

    assert all(n in ORACLES for n in window)


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
