"""Named operator/query library.

Every operator from SURVEY.md §2 (and the scale extensions §2.9) is
registered here as a ``(spark, sf_dir) -> DataFrame`` callable plus —
when SQL-expressible — a DuckDB oracle SQL twin. ``__spark_entry__``
re-exports the registry for the driver's differential harness.
"""

from .registry import QUERIES, ORACLES, query  # noqa: F401

# Importing the modules populates the registry.
from . import relational  # noqa: F401,E402
from . import dialect  # noqa: F401,E402
from . import dedup  # noqa: F401,E402
from . import similarity  # noqa: F401,E402
from . import textstats  # noqa: F401,E402
from . import sessionize  # noqa: F401,E402
from . import multimodal  # noqa: F401,E402
from . import scrub  # noqa: F401,E402
from . import nl_queries  # noqa: F401,E402
from . import profile  # noqa: F401,E402

# The driver's per-round correctness harness verifies the FIRST 50
# registry entries in iteration order. Rounds 1-2 officially verified
# the relational core (q1, P, J1-J7, G1-G10, O, SO1-SO3, W1-W4,
# F1-F11); round 3 covered the NL pipeline, F5, the X families and
# seven TPC-H shapes (CORRECTNESS_r02/r03.json). Round 4's window
# (below) targets the never-checked dialect surface per VERDICT r3
# item 3: the 14 remaining TPC-H shapes, subqueries sq1-sq7, dates
# d1-d6, scalar functions f12-f27, grouping g11-g15 and o5 — plus
# x28b (r3's one red row, fixed this round) and q1 (flagship,
# regression canary).
#
# ROUND-5 WINDOW (active): CORRECTNESS_r04 landed green for the whole
# r4 window except x28b (oracle conditioning, fixed) and f20/f21
# (driver-canonicalizer array columns, serialized — plus the
# registry-wide atomic-output gate in tests/test_registry_schema.py).
# Per the rotation plan, this window re-checks those three fixes plus
# the flagship canary, then covers: the ops whose r3 rows predate the
# portable-hash full oracles (x2/x4/x4b/x6/x7b/x24/x27/x29/x44 —
# VERDICT r4 item 4), SemDeDup (x62/x63, never driver-checked), and
# the never-checked so/w/j/nl tail and x38-x68 block. Everything here
# passes the committed full-registry vanilla diffcheck
# (DIFFCHECK_r05.md); the remaining never-checked entries (x69-x102)
# rotate into the round-6+ windows.
_VERIFY_FIRST = [
    # r4 red rows, fixed this round — must land green
    "x28b_user_value_trend_sql",
    "f20_array_agg_sorted",
    "f21_map_functions",
    "q1_pricing_summary",  # flagship, regression canary
    # stale-err / rows-only-era flagship ops (VERDICT r4 item 4)
    "x2_minhash_neardup",
    "x4_simhash",
    "x4b_simhash_neardup_pairs",
    "x6_ann_lsh_topk",
    "x7b_embedding_neardup_lsh",
    "x24_dedup_keep",
    "x27_ivf_topk",
    "x29_dedup_clusters",
    "x44_knn_graph",
    # SemDeDup pair — never driver-checked
    "x62_semdedup",
    "x63_semdedup_hier",
    # never-checked relational tail
    "so4_intersect_all",
    "so5_except_all",
    "so6_union_by_name",
    "w5_range_frame",
    "w6_first_last_nth",
    "w7_percent_rank_cume",
    "w8_forward_fill",
    "j8_event_range_join",
    "j10_salted_skew_join",
    "j11_fuzzy_name_join",
    "nl6_duckdb_dialect_passthrough",
    # never-checked x-family block (all oracle-backed)
    "x38_cms_heavy_hitters",
    "x39_repetition_ratio",
    "x42_label_centroids",
    "x43_quantize_error",
    "x45_pii_redaction",
    "x46_url_normalize_dedup",
    "x47_chunk_documents",
    "x48_char_diversity_filter",
    "x49_incremental_dedup",
    "x50_length_outlier_filter",
    "x51_domain_cap",
    "x52_funnel_stages",
    "x53_prefix_filter_jaccard",
    "x55_full_prep_pipeline",
    "x56_join_key_skew_report",
    "x57_bigram_rarity",
    "x58_random_projection",
    "x59_source_overlap",
    "x60_mixture_weights",
    "x61_gopher_quality_rules",
    "x64_paragraph_dedup",
    "x65_pq_adc_topk",
    "x66_dsir_importance",
    "x68_repeated_window_spans",
]


def _reorder(priority: list[str]) -> None:
    """Rebuild the registry dicts with ``priority`` names first.

    Names in ``priority`` not (yet) registered are skipped, so the list
    may reference operators added later in the round.
    """
    ordered = [n for n in priority if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered)]
    for d in (QUERIES, ORACLES):
        snapshot = {n: d[n] for n in ordered if n in d}
        d.clear()
        d.update(snapshot)


_reorder(_VERIFY_FIRST)
