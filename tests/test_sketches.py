"""Approximate-sketch quality gates (x37 quantiles, x38 count-min)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ask_duckdb_spark.operators import QUERIES
from ask_duckdb_spark.sources.catalog import load_table
from tests.conftest import SF_DIR_001


def test_x37_quantile_sketch_brackets_exact(spark):
    est = {
        r.lang: (r.p50_est, r.p90_est)
        for r in QUERIES["x37_quantile_sketch"](spark, SF_DIR_001).collect()
    }
    d = load_table(spark, SF_DIR_001, "documents")
    exact = {
        r.lang: (r.p50, r.p90)
        for r in d.groupBy("lang")
        .agg(
            F.expr("percentile(n_chars, 0.5)").alias("p50"),
            F.expr("percentile(n_chars, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for lang, (p50e, p90e) in est.items():
        p50x, p90x = exact[lang]
        # GK sketch with accuracy 100: rank error <= 1%; on these
        # distributions that is a few percent of the value
        assert abs(p50e - p50x) <= max(0.1 * p50x, 50)
        assert abs(p90e - p90x) <= max(0.1 * p90x, 50)


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
