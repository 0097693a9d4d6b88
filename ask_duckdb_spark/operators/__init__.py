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
# surface; r5-r6 the scale extensions; r7 the r6 red trio (fixed),
# the layout/retrieval families, the rows-only fast paths, and every
# operator whose hash the floor-round migration changed — closing at
# 46 pass / 4 by-design rows-only, ZERO red.
#
# ROUND-8 WINDOW (active), per VERDICT r7 item 1: lead with the ONLY
# entries that have zero driver evidence — the r7 post-sweep hygiene
# family x133-x136 and census x137 (local bit-exact diffcheck in
# DIFFCHECK_r07.md; r6 taught that local green does not imply driver
# green) — plus their r8 twins x133b (broadcast contamination join,
# plan-asserted) and x137b (degree-ordered census over a materialized
# edge list), both registered against the SAME oracles. Then q1
# (flagship canary) and x126, whose pair-domain count was rewritten
# structurally this round (ADVICE r7: count(DISTINCT (a,b)) replaces
# the '#'-concat sentinel image — output identical on the fixtures,
# diffcheck-proven, but the driver hash is the hard signal). The
# remaining 41 slots rotate the OLDEST driver evidence: r02 rows from
# the relational core, unchecked since round 2. Rotating into r9: the
# 7 r02 leftovers (p1-p6, p8) and the r8 post-window additions
# x138_padding_waste / x139_dedup_savings / x140_incremental_components
# (local bit-exact diffcheck evidence in DIFFCHECK_r08.md meanwhile,
# the x133-x137 pattern).
_VERIFY_FIRST = [
    # zero driver evidence (VERDICT r7 item 1) + same-oracle twins
    "x133_eval_decontam",
    "x133b_eval_decontam_bcast",
    "x134_tokenizer_fertility",
    "x135_charclass_audit",
    "x136_eval_leak_report",
    "x137_knn_clustering_coeff",
    "x137b_triangle_census_graph",
    "q1_pricing_summary",  # flagship, regression canary
    "x126_fd_audit",  # structural pair count landed r8 (ADVICE r7)
    # oldest driver evidence (r02) — scalar/JSON functions
    "f1_lower_upper",
    "f2_json_extract",
    "f3_json_exists",
    "f4_json_text_like",
    "f6_struct_access",
    "f7_map_access",
    "f8_case_insensitive_eq",
    "f9_string_funcs",
    "f10_case_when",
    "f11_coalesce_nullif",
    # oldest driver evidence (r02) — aggregation
    "g1_count_star",
    "g2_sum_avg_min_max",
    "g3_group_by",
    "g4_having",
    "g5_distinct",
    "g6_count_distinct",
    "g7_rollup",
    "g8_cube",
    "g9_median_percentile",
    # oldest driver evidence (r02) — joins
    "j1_inner_multihop",
    "j2_left_outer",
    "j3_right_outer",
    "j4_full_outer",
    "j5_left_semi",
    "j6_left_anti",
    "j7_cross",
    # oldest driver evidence (r02) — ordering / limits
    "o1_order_by",
    "o2_top_k",
    "o3_offset",
    "o4_limit_deterministic",
    # oldest driver evidence (r02) — predicates (complex forms; the
    # trivial p1-p6/p8 rotate next round)
    "p7_bool_connectives",
    "p9_alias_expr",
    "p10_empty_vs_null",
    "p11_between",
    # oldest driver evidence (r02) — set ops and windows
    "so1_union_all",
    "so2_intersect",
    "so3_except",
    "w1_row_number_topk_per_group",
    "w2_running_sum",
    "w3_lag_delta",
    "w4_rank_dense_ntile",
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
