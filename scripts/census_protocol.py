"""Census cold/warm measurement protocol (VERDICT r9 item 3).

The r9 finding that motivates this: consecutive same-day 10x census
runs read 573 / 419 / 379 / 222 seconds — a ~2x band driven purely by
OS page-cache state over the corpus + shuffle spill, monotone
decreasing as the cache warmed. Every past and future census wall
claim is +-2x until the cache state is pinned. This script pins it:

COLD series: per rep — `sync` + `echo 3 > /proc/sys/vm/drop_caches`
(needs root; the cold series is SKIPPED with a message when the write
is not permitted), `spark.catalog.clearCache()`, then ONE census run.
Every rep is a true cold start on storage. JIT/codegen is pre-warmed
once at sf0.001 before any timing (CPU-side class-cache state is not
what this protocol measures; IO state is).

WARM series: one unrecorded warm-up run over the measured corpus,
then reps recorded. min-of-reps is the steady-state estimator; all
walls are printed so the spread is visible.

Per variant it also records the CANDIDATE-PAIR COUNT at the same
auto-sized band width the census uses (`_sized_band_bits`) — the
volume number VERDICT r9 asks for, so "candidate-bound" is a measured
claim, not an inference from walls.

Usage::

    python scripts/census_protocol.py --factor 10 \
        [--workdir .scale_trial] [--reps 3] \
        [--stages x137b_triangle_census_graph x137_knn_clustering_coeff ivf]

Stage names are full registry keys; the special name ``ivf`` (matched
EXACTLY — ADVICE r10: a prefix match would silently hijack any future
``ivf_*`` registry key away from QUERIES and mis-measure it) runs the
`triangle_census_ivf` library path at n_cells = N_CELLS * factor.

The corpus must already exist under --workdir (reuse a
scale_trial/x140_trial --keep corpus); this script never rebuilds it,
so the on-disk bytes are identical across series and code versions.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.operators.similarity import (  # noqa: E402
    N_CELLS,
    _banded_candidate_pairs,
    _ivf_candidate_pairs,
    _sized_band_bits,
    triangle_census_ivf,
)
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402

WARM_DIR = "/root/testdata/sf0.001"


def drop_page_cache() -> bool:
    """Best-effort OS page-cache drop; True when it actually happened."""
    try:
        os.sync()
        with open("/proc/sys/vm/drop_caches", "w") as f:
            f.write("3\n")
        return True
    except OSError:
        return False


def cache_mb() -> int:
    """buff/cache MiB from /proc/meminfo — printed per rep so the
    reader can verify the cache state the wall was measured under."""
    fields = {}
    with open("/proc/meminfo") as f:
        for line in f:
            k, v = line.split(":", 1)
            fields[k] = int(v.strip().split()[0])
    return (fields.get("Buffers", 0) + fields.get("Cached", 0)) // 1024


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--workdir",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".scale_trial",
        ),
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--stages", nargs="*", default=["x137b_triangle_census_graph",
                                        "x137_knn_clustering_coeff"]
    )
    args = ap.parse_args()

    if not os.path.isdir(os.path.join(args.workdir, "embeddings.parquet")):
        print(f"no corpus under {args.workdir} — build one first "
              f"(scale_trial.py --keep)", file=sys.stderr)
        return 2

    spark = get_spark("census-protocol")
    print(f"corpus: {args.workdir} (factor {args.factor}), "
          f"load1 {os.getloadavg()[0]:.2f}")

    # JIT/codegen warm-up at sf0.001 — negligible IO, real class cache.
    for name in args.stages:
        if name == "ivf":
            triangle_census_ivf(spark, WARM_DIR).count()
        else:
            QUERIES[name](spark, WARM_DIR).count()
    spark.catalog.clearCache()

    # Candidate volume at the sizing the census actually runs with.
    bits = _sized_band_bits(spark, args.workdir, "census-protocol")
    emb = load_table(spark, args.workdir, "embeddings")
    n_vec = emb.count()
    ivf_cells = N_CELLS * args.factor  # the x62 corpus-scaled sizing
    if any(s == "ivf" for s in args.stages):
        n_ivf = _ivf_candidate_pairs(
            emb, keep_self=True, n_cells=ivf_cells
        ).count()
        spark.catalog.clearCache()
        print(f"candidate volume [ivf n_cells={ivf_cells} n_probe=3]: "
              f"{n_ivf:,} directed pairs over {n_vec:,} vectors "
              f"({n_ivf / max(n_vec, 1):.1f} per vector)")
    if any(s != "ivf" for s in args.stages):
        n_cand = _banded_candidate_pairs(emb, keep_self=True,
                                         band_bits=bits).count()
        spark.catalog.clearCache()
        print(f"candidate volume [banded bits={bits}]: {n_cand:,} "
              f"directed candidate pairs over {n_vec:,} vectors "
              f"({n_cand / max(n_vec, 1):.1f} per vector)")

    def one_run(name: str) -> float:
        t0 = time.time()
        if name == "ivf":
            triangle_census_ivf(spark, args.workdir,
                                n_cells=ivf_cells).count()
        else:
            QUERIES[name](spark, args.workdir).count()
        wall = time.time() - t0
        spark.catalog.clearCache()
        return wall

    can_cold = drop_page_cache()
    if not can_cold:
        print("COLD series skipped: /proc/sys/vm/drop_caches not writable")

    for name in args.stages:
        if can_cold:
            walls = []
            for _ in range(args.reps):
                drop_page_cache()
                pre = cache_mb()
                w = one_run(name)
                walls.append(w)
                print(f"  {name} COLD rep: {w:.1f}s "
                      f"(buff/cache before {pre} MiB)")
            print(f"{name} COLD: min-of-{args.reps} {min(walls):.1f}s "
                  f"(all {[f'{w:.1f}' for w in walls]})")
        # WARM: one unrecorded warm-up, then recorded reps.
        one_run(name)
        walls = []
        for _ in range(args.reps):
            pre = cache_mb()
            w = one_run(name)
            walls.append(w)
            print(f"  {name} WARM rep: {w:.1f}s "
                  f"(buff/cache before {pre} MiB)")
        print(f"{name} WARM: min-of-{args.reps} {min(walls):.1f}s "
              f"(all {[f'{w:.1f}' for w in walls]})")

    print(f"done; load1 {os.getloadavg()[0]:.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
