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
from . import layout  # noqa: F401,E402
from . import stats_audit  # noqa: F401,E402
from . import hygiene  # noqa: F401,E402

# The driver's per-round correctness harness verifies the FIRST 50
# registry entries in iteration order. History: r2 verified the
# relational core; r3 the NL pipeline + X families; r4 the dialect
# surface; r5-r6 the scale extensions; r7 the r6 red trio (fixed) +
# the layout/retrieval families; r8 closed 50/50 full-pass (the
# x133-x137 hygiene/census block + the r02-stale relational core);
# r9 closed 50/50 again (x138-x140/x117b + the x44-restructure
# consumers + the r02/r03 relational+NL tail).
#
# ROUND-11 WINDOW (active), per VERDICT r10 items 1-2: lead with the
# two NEW zero-evidence entries registering the IVF scale path
# (x141/x142 - the designated 100 TB census plan, judge item 1; they
# also re-exercise the ADVICE-r10 primary-member cap fix in
# _ivf_candidate_pairs), then walk the judge-traced stalest tail:
# the r04 TPC-H q-suite (q11-q22, last rows in CORRECTNESS_r04.json),
# the full 32-entry r05 block (x6/x24/x27/x29/x38/x42/x45-x63/x66,
# f20/f21, nl6, so4-so6 - x27/x62/x63 also sit downstream of the
# _ivf_sql refactor, so their slots double as regression evidence),
# topped up to 50 from the r06 tail head (g12, w5, x100-family).
# Still stale after this window: the remaining 28 r06 rows - keep
# walking in r12.
_VERIFY_FIRST = [
    # NEW this round: the IVF census/knn-graph scale path, oracle-
    # paired via the x62/x63 QSCALE discipline (VERDICT r10 item 1)
    "x141_ivf_knn_graph",
    "x142_ivf_triangle_census",
    # r04 TPC-H q-suite: the oldest driver evidence anywhere
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q21_waiting_suppliers",
    "q22_dormant_high_balance",
    # r05 block: dialect tail
    "f20_array_agg_sorted",
    "f21_map_functions",
    "nl6_duckdb_dialect_passthrough",
    "so4_intersect_all",
    "so5_except_all",
    "so6_union_by_name",
    # r05 block: scale-extension mid-tail
    "x24_dedup_keep",
    "x27_ivf_topk",
    "x29_dedup_clusters",
    "x38_cms_heavy_hitters",
    "x42_label_centroids",
    "x45_pii_redaction",
    "x46_url_normalize_dedup",
    "x47_chunk_documents",
    "x48_char_diversity_filter",
    "x49_incremental_dedup",
    "x4b_simhash_neardup_pairs",
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
    "x62_semdedup",
    "x63_semdedup_hier",
    "x66_dsir_importance",
    "x6_ann_lsh_topk",
    # r06 tail head: fills to 50
    "g12_stats_agg",
    "w5_range_frame",
    "x100_event_transitions",
    "x102_journey_surprisal",
    "x103_column_profile",
    "x105_embedding_drift",
    "x108_reshard_audit",
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
