"""Approximate-sketch quality gates (x37 quantiles, x38 count-min)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.sources.catalog import load_table
from tests.conftest import SF_DIR_001


def test_x37_quantile_sketch_brackets_exact(spark):
    # the op's hashed contract: rank-selected exact quantiles + the
    # sketch-in-bound booleans; here additionally bracket Spark's raw
    # GK estimate against the exact percentile (the tighter value gate
    # the portable contract deliberately doesn't hash)
    out = {
        r.lang: r
        for r in QUERIES["x37_quantile_sketch"](spark, SF_DIR_001).collect()
    }
    d = load_table(spark, SF_DIR_001, "documents")
    exact = {
        r.lang: (r.p50, r.p90, r.n)
        for r in d.groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.9)").alias("p90"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    est = {
        r.lang: (r.q50, r.q90)
        for r in d.groupBy("lang")
        .agg(
            F.expr("approx_percentile(n_chars, 0.5, 100)").alias("q50"),
            F.expr("approx_percentile(n_chars, 0.9, 100)").alias("q90"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for lang, r in out.items():
        p50x, p90x, n = exact[lang]
        assert r["n"] == n
        # rank-selected exact value sits within one value step of the
        # interpolating percentile (integer data, ceil-rank selection)
        assert r["p50_in_bound"] and r["p90_in_bound"]
        p50e, p90e = est[lang]
        assert abs(p50e - p50x) <= max(0.1 * p50x, 50)
        assert abs(p90e - p90x) <= max(0.1 * p90x, 50)
        assert abs(r["p50_exact"] - p50x) <= max(0.05 * p50x, 10)
        assert abs(r["p90_exact"] - p90x) <= max(0.05 * p90x, 10)


def test_x38_cms_one_sided_and_tight_for_heavy_hitters(spark):
    rows = QUERIES["x38_cms_heavy_hitters"](spark, SF_DIR_001).collect()
    assert len(rows) == 20
    total_tokens = sum(r.true_freq for r in rows)  # lower bound on stream
    for r in rows:
        assert r.est_freq >= r.true_freq, "CMS must never underestimate"
        # expected overestimate ~ stream/width per collision; allow 4x
        assert r.est_freq - r.true_freq <= 4 * (total_tokens * 50) / 1024
    # the single heaviest term should be estimated nearly exactly
    top = rows[0]
    assert top.est_freq - top.true_freq <= 0.05 * top.true_freq


def test_x54_ffd_packing_invariants(spark):
    """FFD bins respect the budget, hit the volume lower bound within
    the classic 11/9 OPT + 1 guarantee, and never pack looser than
    x30's contiguous packing."""
    import math

    from ask_duckdb_spark.operators import QUERIES
    from ask_duckdb_spark.operators.textstats import BIN_TOKEN_BUDGET
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    out = QUERIES["x54_pack_bins_ffd"](spark, SF_DIR).cache()
    fill = (
        out.groupBy("lang", "bin_id")
        .agg(F.sum("n_tokens").alias("fill"), F.count("*").alias("n"))
        .collect()
    )
    # budget respected except single-doc overfull bins
    for r in fill:
        assert r["fill"] <= BIN_TOKEN_BUDGET or r["n"] == 1
    per_lang = {
        (r["lang"]): (r["total"], r["bins"])
        for r in out.groupBy("lang")
        .agg(
            F.sum("n_tokens").alias("total"),
            F.countDistinct("bin_id").alias("bins"),
        )
        .collect()
    }
    for lang, (total, bins) in per_lang.items():
        lower = math.ceil(total / BIN_TOKEN_BUDGET)
        # any-fit upper bound from the volume argument: at most one
        # bin ends less than half full, so bins <= 2*total/budget + 1.
        # (11/9 is relative to OPT, not the volume bound — do not use
        # it here: all-slightly-over-half-budget docs would break it.)
        assert lower <= bins <= 2 * lower + 1, lang
    out.unpersist()


def test_percentile_sketch_swap_path_bounds(spark):
    """x104/x110/x111/x112 all document 'swap percentile ->
    approx_percentile at 100 TB' (g9's rule). Prove the swap stays
    within sketch tolerance on the real value distribution: at
    accuracy 1000 the approx p50/p90 must land within the exact
    distribution's neighboring mass (rank error <= n/1000)."""
    from pyspark.sql import functions as F

    from ask_duckdb_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR_001

    e = load_table(spark, SF_DIR_001, "events")
    row = e.agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("a50"),
        F.expr("approx_percentile(value, 0.9, 1000)").alias("a90"),
        F.count("*").alias("n"),
    ).collect()[0]
    # rank-error bound: count of values strictly between exact and
    # approx answers must be <= n/1000 (+1 slack for interpolation)
    for exact, approx in ((row.p50, row.a50), (row.p90, row.a90)):
        lo, hi = sorted((exact, approx))
        between = e.filter(
            (F.col("value") > lo) & (F.col("value") < hi)
        ).count()
        assert between <= row.n / 1000 + 1, (exact, approx, between)
