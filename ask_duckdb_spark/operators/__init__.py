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
# F1-F11); round 3 covered the NL pipeline, F5, the X families and
# seven TPC-H shapes (CORRECTNESS_r02/r03.json). Round 4's window
# (below) targets the never-checked dialect surface per VERDICT r3
# item 3: the 14 remaining TPC-H shapes, subqueries sq1-sq7, dates
# d1-d6, scalar functions f12-f27, grouping g11-g15 and o5 — plus
# x28b (r3's one red row, fixed this round) and q1 (flagship,
# regression canary).
#
# ROUND-5 ROTATION PLAN: once CORRECTNESS_r04 lands green rows for
# the list below, rotate in the final never-checked block —
# so4-so6, w5-w8, j8/j10/j11, nl6, and the x-family tail
# (x4/x4b/x24/x27/x29/x37-x63 not yet checked) — plus re-checks of
# the entries whose checks were rows-only before the r4 portable-hash
# layer landed full oracles on them: x2, x4, x4b, x6, x7b, x44, x24,
# x29 should all come back as full value-hash passes.
_VERIFY_FIRST = [
    "x28b_user_value_trend_sql",  # r3's one FAIL — fixed, must re-check
    "q1_pricing_summary",  # flagship, regression canary
    # TPC-H shapes never driver-checked
    "q2_min_cost_supplier",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_priority_shipping",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q19_disjunctive_predicates",
    "q20_excess_shipments",
    "q21_waiting_suppliers",
    "q22_dormant_high_balance",
    # subqueries / CTEs
    "sq1_scalar_subquery",
    "sq2_in_subquery",
    "sq3_correlated_exists",
    "sq4_cte",
    "sq5_lateral_join",
    "sq6_values_inline",
    "sq7_recursive_cte",
    # date/time surface
    "d1_date_trunc",
    "d2_extract_parts",
    "d3_date_arith",
    "d4_format_epoch",
    "d5_month_arith",
    "d6_generate_days",
    # scalar-function surface
    "f12_regexp",
    "f13_split_array",
    "f14_math",
    "f16_nullsafe_eq",
    "f17_pivot",
    "f18_greatest_least",
    "f19_json_tuple",
    "f20_array_agg_sorted",
    "f21_map_functions",
    "f22_pad_reverse",
    "f23_bitwise",
    "f24_cast_matrix",
    "f25_width_bucket_histogram",
    "f26_posexplode_ordinality",
    "f27_unpivot",
    # grouping extensions + ordering
    "g11_grouping_sets",
    "g12_stats_agg",
    "g13_mode",
    "g14_string_agg_ordered",
    "g15_group_percentiles",
    "o5_nulls_ordering",
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
