"""Partition-invariance pins for the exact-arithmetic discipline.

The x28b failure mode (driver-red r3-r5 while locally green) was float
aggregation whose last ulp depended on HOW the data was partitioned —
the one axis local testing never varied and the driver's environment
did. The r6 rewrites make every hashed aggregate an exact integer sum,
which is order-independent BY CONSTRUCTION; these tests pin that
property by executing representative rewritten operators under three
adversarial shuffle-partition settings (1 / 7 / 32 — serial, odd, and
the tuned default) and asserting the collected results are
BIT-IDENTICAL (uint64 view of float64 columns, not tolerance).

A regression that reintroduces a float accumulation into a hashed
column shows up here as a last-ulp mismatch between partition counts —
the exact class ROUND used to hide.
"""

from __future__ import annotations

import numpy as np
import pytest

from ask_duckdb_spark.operators import QUERIES

SF_DIR_001 = "/root/testdata/sf0.01"

#: Representative rewritten operators, one per family: the native
#: integer-sufficient-statistics slope (the original offender), a
#: TPC-H cents-sum join shape, a window running sum, integer-stat
#: aggregates, and a quantized-weight normalization.
PINNED = [
    "x28b_user_value_trend_sql",
    "q3_shipping_priority",
    "w2_running_sum",
    "g12_stats_agg",
    "x60_mixture_weights",
    # layout family (r6): CDC's full-outer classify and the
    # partial-merge identity are exactly the shapes a partitioning
    # change would perturb if any accumulation were float
    "x115_snapshot_cdc_diff",
    "x120_partial_agg_merge",
    # retrieval/audit family (r6): the correlation close is the exact
    # shape (sums -> one shared double sequence) whose decimal-literal
    # dialect split this round's tests caught; the winsorized mean
    # closes from rank-selected integer bounds
    "x127_corr_matrix",
    "x128_winsorized_stats",
    # r12 rewrites: the decomposed MERGE (broadcast left + semi/anti
    # union — a union's partition layout is exactly what varies here)
    # and the KS drift under its enforced quantization grid (cumulative
    # windows over the quantized cells)
    "x116_merge_upsert",
    "x132_ks_drift",
]


def _bits(pdf):
    """Canonical bit-image of a result frame: rows sorted, float64
    columns viewed as uint64 (NaN payloads normalized), others as str."""
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    pdf = pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    out = {}
    for c in pdf.columns:
        if str(pdf[c].dtype) == "float64":
            v = pdf[c].to_numpy(dtype=np.float64)
            u = v.view(np.uint64).copy()
            u[np.isnan(v)] = np.uint64(0x7FF8000000000000)
            out[c] = u.tolist()
        else:
            out[c] = pdf[c].astype(str).tolist()
    return out


@pytest.mark.parametrize("name", PINNED)
def test_bit_identical_across_partitionings(spark, name):
    baseline = None
    for parts in ("1", "7", "32"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            got = _bits(QUERIES[name](spark, SF_DIR_001).toPandas())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            spark.catalog.clearCache()
        if baseline is None:
            baseline = got
        else:
            assert got == baseline, (
                f"{name}: result bits changed with shuffle.partitions="
                f"{parts} — a hashed column re-acquired order-dependent "
                "float accumulation (the x28b class)"
            )
