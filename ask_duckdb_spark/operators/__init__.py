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
# x133-x137 hygiene/census block + the r02-stale relational core).
#
# ROUND-9 WINDOW (active), per VERDICT r8 items 1/7: lead with the
# only entries that have zero driver evidence — the r8 post-sweep
# additions x138/x139/x140 (local bit-exact diffcheck in
# DIFFCHECK_r08.md; r6 taught local green != driver green) and the
# r9-registered x117b plain-semi twin — then every operator whose
# PHYSICAL PLAN changed this round: the x44 banded-candidate
# restructure (narrow id-only shuffles + KNN_MAX_BUCKET skew cap,
# VERDICT r8 item 3) feeds x44/x7b/x69/x137/x137b, all of whose
# oracles were regenerated from the shared _capped_pairs_sql fragment
# — outputs are diffcheck-identical but the driver hash is the hard
# signal. Then q1 (flagship canary), the seven r02-only relational
# rows (p1-p6, p8 — the oldest evidence anywhere), the nl1-nl5
# pipeline (item 7: the reference's primary entry point, r03-stale),
# and the front of the r03 tail (f5, j9, the q-suite, x1-x23). Still
# r03/r04-stale after this window: x25-x36, the d/f/g dialect blocks
# — keep walking in r10.
_VERIFY_FIRST = [
    # zero driver evidence (VERDICT r8 item 1) + the r9 registration
    "x138_padding_waste",
    "x139_dedup_savings",
    "x140_incremental_components",
    "x117b_plain_semijoin",
    # plan changed r9 (x44 candidate restructure + bucket cap)
    "x44_knn_graph",
    "x7b_embedding_neardup_lsh",
    "x69_knn_pagerank",
    "x137_knn_clustering_coeff",
    "x137b_triangle_census_graph",
    "q1_pricing_summary",  # flagship, regression canary
    # oldest driver evidence (r02): the trivial predicate forms
    "p1_projection",
    "p2_select_star",
    "p3_filter_eq",
    "p4_like",
    "p5_ilike",
    "p6_null_checks",
    "p8_in_list",
    # NL pipeline (VERDICT r8 item 7; r03-stale)
    "nl1_fence_extraction",
    "nl2_fuzzy_identifier_repair",
    "nl3_alias_substitution",
    "nl4_literal_canonicalization",
    "nl5_full_ask_lifecycle",
    # r03-stale tail: remaining JSON op, as-of join, the q-suite
    "f5_json_array_membership",
    "j9_asof_last_purchase",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    # r03-stale tail: the x1-x23 corpus core
    "x1_dedup_exact",
    "x1b_dedup_hash_key",
    "x3_ngram_jaccard_pairs",
    "x5_cosine_topk",
    "x7_embedding_neardup",
    "x8_token_stats",
    "x9_top_terms",
    "x11_lang_id",
    "x12_fingerprint",
    "x13_sessionize",
    "x14_session_window",
    "x15_tumbling_window",
    "x16_sliding_window",
    "x17_session_stats",
    "x18_props_schema_on_read",
    "x19_binary_metadata",
    "x20_decode_features",
    "x21_token_count_bpe",
    "x23_hash_sample",
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
