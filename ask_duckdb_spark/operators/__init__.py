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
# ROUND-10 WINDOW (active), per VERDICT r9 item 1: with every entry
# now driver-checked at least once and zero red rows, the whole
# window walks the stalest CORRECTNESS tail. Lead with the x2
# near-dup flagship (bench-timed every round, last driver hash r05),
# then the ten r03-only scale-extension rows (x25-x36 - the oldest
# evidence anywhere), then the r04 dialect surface the judge traced
# to CORRECTNESS_r04.json - subqueries sq1-sq7, date ops d1-d6, the
# f12-f27 function extras, g11/g13-g15 aggregates, o5, and the
# q7/q8/q9 TPC-H tail - then the r05 specialty joins j8/j10/j11,
# windows w6/w8, and the x4 simhash bench headline. Still stale
# after this window: q11-q22 (r04), the x24+/x37+ mid-tail
# (r05-r07) - keep walking in r11.
_VERIFY_FIRST = [
    # flagship near-dup, judge-named first (VERDICT r9 item 1)
    "x2_minhash_neardup",
    # r03-only driver evidence: the oldest rows anywhere
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
    # r04 dialect surface: subqueries
    "sq1_scalar_subquery",
    "sq2_in_subquery",
    "sq3_correlated_exists",
    "sq4_cte",
    "sq5_lateral_join",
    "sq6_values_inline",
    "sq7_recursive_cte",
    # r04: date/time ops
    "d1_date_trunc",
    "d2_extract_parts",
    "d3_date_arith",
    "d4_format_epoch",
    "d5_month_arith",
    "d6_generate_days",
    # r04: function extras
    "f12_regexp",
    "f13_split_array",
    "f16_nullsafe_eq",
    "f17_pivot",
    "f18_greatest_least",
    "f19_json_tuple",
    "f22_pad_reverse",
    "f23_bitwise",
    "f24_cast_matrix",
    "f25_width_bucket_histogram",
    "f26_posexplode_ordinality",
    "f27_unpivot",
    # r04: aggregate extras + ordering + TPC-H tail head
    "g11_grouping_sets",
    "g13_mode",
    "g14_string_agg_ordered",
    "g15_group_percentiles",
    "o5_nulls_ordering",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    # r05: specialty joins + window tail + simhash headline
    "j8_event_range_join",
    "j10_salted_skew_join",
    "j11_fuzzy_name_join",
    "w6_first_last_nth",
    "w8_forward_fill",
    "x4_simhash",
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
