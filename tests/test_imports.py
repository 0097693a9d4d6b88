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
    entries in iteration order. Rounds 1-2 green-lit the relational
    core, so the window must now lead with the entries that still lack
    an official CORRECTNESS row (F5, NL pipeline, every X family)."""
    from ask_duckdb_spark.operators import QUERIES

    window = list(QUERIES)[:50]
    must_be_in_window = {
        "f5_json_array_membership",
        "nl1_fence_extraction",
        "nl2_fuzzy_identifier_repair",
        "nl3_alias_substitution",
        "nl4_literal_canonicalization",
        "nl5_full_ask_lifecycle",
        "x1_dedup_exact",      # dedup family
        "x2_minhash_neardup",
        "x5_cosine_topk",      # similarity family
        "x8_token_stats",      # text family
        "x13_sessionize",      # session family
        "x18_props_schema_on_read",  # multimodal family
        "x30_pack_shards",     # corpus-prep family
        "q3_shipping_priority",  # TPC-H shapes
        "j9_asof_last_purchase",
        "q1_pricing_summary",  # flagship stays official
    }
    assert must_be_in_window <= set(window)


def test_nl_and_cli_import():
    import ask_duckdb_spark.cli.ask  # noqa: F401
    import ask_duckdb_spark.cli.describe  # noqa: F401
    import ask_duckdb_spark.cli.sql  # noqa: F401
    import ask_duckdb_spark.nl  # noqa: F401
