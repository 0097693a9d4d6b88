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

# The driver's per-round correctness harness verifies the FIRST 50
# registry entries in iteration order. Rounds 1-2 officially verified
# the relational core (q1, P, J1-J7, G1-G10, O, SO1-SO3, W1-W4,
# F1-F11) — see CORRECTNESS_r02.json. Rotate the window so entries
# that still lack an official row go first: F5, the NL pipeline, the
# LLM-data-pipeline operators (dedup / similarity / text / session /
# multimodal), the TPC-H shapes, and the as-of join. Everything else
# keeps registration order behind them.
#
# ROUND-4 ROTATION PLAN: once CORRECTNESS_r03 lands green rows for the
# list below, rotate in the entries that will then be the only ones
# without official rows — d1-d6, sq1-sq7, f12-f27, g11-g15, o5,
# so4-so6, w5-w8, j8, j10, q7/q8/q13/q15/q17/q19/q22, x39/x42/x43,
# and the remaining rows-only ops (x4/x4b, x24/x27/x29/x37/x38/x44) —
# keeping q1 in-window as the flagship.
_VERIFY_FIRST = [
    "f5_json_array_membership",
    "nl1_fence_extraction",
    "nl2_fuzzy_identifier_repair",
    "nl3_alias_substitution",
    "nl4_literal_canonicalization",
    "nl5_full_ask_lifecycle",
    # dedup family
    "x1_dedup_exact",
    "x1b_dedup_hash_key",
    "x35_dedup_normalized",
    "x3_ngram_jaccard_pairs",
    "x2_minhash_neardup",  # rows-only by design (sketch)
    # similarity family
    "x5_cosine_topk",
    "x25_batch_ann_topk",
    "x7_embedding_neardup",
    "x7b_embedding_neardup_lsh",  # rows-only by design (LSH blocking)
    "x6_ann_lsh_topk",  # rows-only by design (ANN)
    # text-analysis family
    "x8_token_stats",
    "x9_top_terms",
    "x10_quality_score",
    "x11_lang_id",
    "x12_fingerprint",
    "x21_token_count_bpe",
    "x22_tfidf_top_term",
    "x23_hash_sample",
    "x26_salted_user_totals",
    # corpus-prep family
    "x30_pack_shards",
    "x31_clean_corpus",
    "x32_rebalance_sample",
    "x33_decontamination",
    "x34_train_val_test_split",
    # sessionization family
    "x13_sessionize",
    "x14_session_window",
    "x15_tumbling_window",
    "x16_sliding_window",
    "x17_session_stats",
    # multimodal family
    "x18_props_schema_on_read",
    "x19_binary_metadata",
    "x20_decode_features",
    "x28_user_value_trend",
    "x28b_user_value_trend_sql",
    "x36_frame_sample",
    # TPC-H shapes + as-of join
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q14_promo_effect",
    "q18_large_orders",
    "j9_asof_last_purchase",
    "q1_pricing_summary",  # keep the flagship inside the window
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
