"""Similarity / dedup operator quality gates.

The key regression guard: x6 (ANN) must recall >= 0.8 of x5's exact
top-10 (VERDICT r1: a previous tuning silently returned 0 rows)."""

from __future__ import annotations

import pytest

from ask_duckdb_spark.operators import QUERIES
from tests.conftest import SF_DIR_001


@pytest.fixture(scope="module")
def exact_top10(spark):
    return {r.vec_id for r in QUERIES["x5_cosine_topk"](spark, SF_DIR_001).collect()}


def test_x6_ann_recall_against_exact(spark, exact_top10):
    approx = {
        r.vec_id for r in QUERIES["x6_ann_lsh_topk"](spark, SF_DIR_001).collect()
    }
    assert len(approx) == 10  # never silently under-deliver
    recall = len(exact_top10 & approx) / len(exact_top10)
    assert recall >= 0.8, f"ANN recall {recall} below floor"


def test_x27_ivf_recall_against_exact(spark, exact_top10):
    approx = {r.vec_id for r in QUERIES["x27_ivf_topk"](spark, SF_DIR_001).collect()}
    assert len(approx) == 10
    recall = len(exact_top10 & approx) / len(exact_top10)
    assert recall >= 0.8, f"IVF recall {recall} below floor"


def test_x2_minhash_pairs_nonempty_and_thresholded(spark):
    rows = QUERIES["x2_minhash_neardup"](spark, SF_DIR_001).collect()
    assert rows, "minhash near-dup found nothing at sf0.01"
    assert all(r.jaccard_est >= 0.5 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_x3_ngram_jaccard_nonvacuous(spark):
    df = QUERIES["x3_ngram_jaccard_pairs"](spark, SF_DIR_001)
    assert df.limit(1).count() == 1, "x3 became vacuous again"


def test_x7_neardup_nonvacuous(spark):
    rows = QUERIES["x7_embedding_neardup"](spark, SF_DIR_001).collect()
    assert rows, "x7 became vacuous again"


def test_x7b_lsh_blocking_vs_brute_force_and_label_twin(spark):
    """x7b (LSH band blocking, whole corpus) must (a) never emit a
    false pair — candidates are cosine-verified, so precision is 1.0 by
    construction; (b) recall >= 0.9 of the brute-force all-pairs truth;
    (c) recover every pair the label-blocked oracle twin (x7) finds —
    proving the banded join replaces the quadratic label join."""
    from pyspark.sql import functions as F

    from ask_duckdb_spark.functions.vectors import cosine_similarity
    from ask_duckdb_spark.operators.similarity import NEARDUP_T
    from ask_duckdb_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_001, "embeddings")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    exact = {
        (r.id_a, r.id_b)
        for r in a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(cosine_similarity(F.col("ea"), F.col("eb")) > NEARDUP_T)
        .select("id_a", "id_b")
        .collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in QUERIES["x7b_embedding_neardup_lsh"](spark, SF_DIR_001).collect()
    }
    label = {
        (r.id_a, r.id_b)
        for r in QUERIES["x7_embedding_neardup"](spark, SF_DIR_001).collect()
    }
    assert lsh <= exact, "LSH emitted a pair below the cosine threshold"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH blocking recall {recall} below floor"
    assert label <= lsh, "banded blocking lost a same-label pair"


def test_x24_keep_is_consistent_with_x29_canonicals(spark):
    """Cluster canonicals (x29 minimum ids) must all survive x24's
    pair-based filter: the minimum of a cluster is never the id_b of
    any pair (pairs are ordered id_a < id_b), so x24 keeps it."""
    kept = {r.doc_id for r in QUERIES["x24_dedup_keep"](spark, SF_DIR_001).collect()}
    canonicals = {
        r.cluster
        for r in QUERIES["x29_dedup_clusters"](spark, SF_DIR_001).collect()
    }
    assert canonicals <= kept


def test_x29_clusters_equal_union_find(spark):
    """Distributed label propagation must produce exactly the connected
    components a sequential union-find finds on the same edges."""
    pairs = [
        (r.id_a, r.id_b)
        for r in QUERIES["x2_minhash_neardup"](spark, SF_DIR_001).collect()
    ]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    want = {v: find(v) for v in parent}
    got = {
        r.doc_id: r.cluster
        for r in QUERIES["x29_dedup_clusters"](spark, SF_DIR_001).collect()
    }
    assert got == want
    assert len(set(got.values())) > 1  # real multi-cluster structure


def test_x4b_simhash_pairing_exact_within_radius_and_x2_overlap(spark):
    """x4b's band join is pigeonhole-EXACT for candidates (any pair
    within Hamming<=3 differs in at most 3 of 4 bands, so >=1 band key
    matches) — the banded join + bit_count verification must therefore
    equal the BRUTE-FORCE set of signature pairs within the radius,
    with the reported distances. Separately, a substantial fraction of
    x2's Jaccard>=0.5 pairs must reappear (different sketch, so overlap
    < 1 is expected, but ~0 would mean a broken signature)."""
    sigs = {
        r.doc_id: r.simhash
        for r in QUERIES["x4_simhash"](spark, SF_DIR_001).collect()
    }
    want = {}
    ids = sorted(sigs)
    mask64 = (1 << 64) - 1  # signatures are signed longs: two's-complement
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b]) & mask64).count("1")
            if h <= 3:
                want[(a, b)] = h

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in QUERIES["x4b_simhash_neardup_pairs"](spark, SF_DIR_001).collect()
    }
    assert got, "x4b found no pairs at sf0.01"
    assert got == want, "banded pairing != brute force within Hamming radius"

    x2_pairs = {
        (r.id_a, r.id_b)
        for r in QUERIES["x2_minhash_neardup"](spark, SF_DIR_001).collect()
    }
    overlap = len(x2_pairs & set(got)) / len(x2_pairs)
    assert overlap >= 0.4, f"x4b/x2 overlap collapsed: {overlap}"


def test_x44_knn_graph_recall_vs_brute_force(spark):
    """The LSH-candidate k-NN graph must recover >= 0.8 of the exact
    brute-force graph's edges and emit k neighbors for (almost) every
    vector — banding can starve a vector only if it collides with
    fewer than k others, which the floor below also guards."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ask_duckdb_spark.functions.vectors import cosine_similarity
    from ask_duckdb_spark.operators.similarity import KNN_K
    from ask_duckdb_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_001, "embeddings")
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("eb"))
    w = W.partitionBy("src").orderBy(
        F.col("sim").desc(), "dst"
    )
    exact = {
        (r.src, r.dst)
        for r in a.crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", cosine_similarity("ea", "eb").alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .collect()
    }
    got = {
        (r.src, r.dst)
        for r in QUERIES["x44_knn_graph"](spark, SF_DIR_001).collect()
    }
    n_vec = emb.count()
    assert len(got) >= 0.95 * n_vec * KNN_K  # nearly every vector served
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"knn-graph recall {recall} below floor"


def test_x53_prefix_index_is_smaller_than_full_index(spark):
    """The point of prefix filtering: the joined index must be a strict
    (and substantial) subset of the full posting set."""
    import ask_duckdb_spark.operators.dedup as dd
    from ask_duckdb_spark.functions.text import char_ngrams
    from ask_duckdb_spark.sources.catalog import load_table
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    d = load_table(spark, SF_DIR, "documents")
    grams = d.select(
        "doc_id", F.explode(char_ngrams(F.col("text"), 8)).alias("g")
    ).dropDuplicates(["doc_id", "g"])
    full_n = grams.count()
    df_counts = grams.groupBy("g").agg(F.count("*").alias("df"))
    ranked = grams.join(df_counts, "g").withColumn(
        "rnk", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "g"))
    )
    sizes = grams.groupBy("doc_id").agg(F.count("*").alias("n"))
    prefix_n = (
        ranked.join(sizes, "doc_id")
        .filter(F.col("rnk") <= F.col("n") - F.ceil(0.5 * F.col("n")) + 1)
        .count()
    )
    # t=0.5 keeps ~n/2+1 postings per doc
    assert prefix_n < 0.62 * full_n


def test_x62_semdedup_matches_bruteforce(spark):
    """Re-derive the SemDeDup keep set per cell in plain Python from
    the operator's own cell assignment: dropped <=> some lower-id
    cellmate has cosine >= NEARDUP_T. Also: representatives (lowest id
    per cell) are always kept and the gate is non-vacuous."""
    import math

    from ask_duckdb_spark.operators.similarity import NEARDUP_T

    out = QUERIES["x62_semdedup"](spark, SF_DIR_001).collect()
    assert len(out) == 500  # one verdict per corpus vector
    kept = {r.vec_id: r.kept for r in out}
    cell_of = {r.vec_id: r.cell for r in out}
    assert any(kept.values()) and not all(kept.values())

    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(
            f"{SF_DIR_001}/embeddings.parquet"
        ).collect()
    }

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return num / den

    by_cell: dict[int, list[int]] = {}
    for vid, c in cell_of.items():
        by_cell.setdefault(c, []).append(vid)
    for members in by_cell.values():
        members.sort()
        assert kept[members[0]], "lowest id in a cell must survive"
        for i, b in enumerate(members):
            want_drop = any(
                cos(emb[a], emb[b]) >= NEARDUP_T for a in members[:i]
            )
            assert kept[b] == (not want_drop), f"vec {b}"


def test_x63_hier_recall_comparable_to_flat_at_equal_granularity(spark):
    """The hierarchical quantizer buys its 42x assignment speedup
    (SCALE.md 100x trial) with DIFFERENT cell boundaries, not with
    materially fewer cells searched: at equal effective granularity
    (flat n_cells=16 vs hier 4x4), the hierarchical drop set must stay
    within 30% of the flat one. Guards against a regression where the
    two-level assignment degenerates (e.g. every vector landing in one
    fine cell's seed)."""
    from ask_duckdb_spark.operators.similarity import (
        N_COARSE,
        N_FINE,
        x62_semdedup,
        x63_semdedup_hier,
    )

    from tests.conftest import SF_DIR

    sf = SF_DIR
    flat = x62_semdedup(spark, sf, n_cells=N_COARSE * N_FINE).toPandas()
    hier = x63_semdedup_hier(spark, sf).toPandas()
    n_flat = int((~flat.kept).sum())
    n_hier = int((~hier.kept).sum())
    assert n_flat > 0  # non-vacuous fixture
    assert n_hier >= 0.7 * n_flat, (n_hier, n_flat)
    # and the hierarchical assignment actually uses multiple cells
    assert hier[["ccell", "fcell"]].drop_duplicates().shape[0] >= 4


def test_band_bits_is_a_real_scale_knob(spark, tmp_path_factory):
    """SCALE.md's x69/x7b honest wall says candidate volume at fixed
    BAND_BITS grows O(n^2 / 2^bits) and production must raise bits with
    n. This gate proves the knob works: on a 400-vector corpus with
    two planted exact-duplicate pairs, raising band_bits 3 -> 8 must
    (a) cut candidate volume by >= 4x and (b) keep BOTH planted pairs
    (identical vectors share every sign bit, so they collide in all
    bands at any width)."""
    import hashlib

    from ask_duckdb_spark.operators.similarity import (
        _banded_candidate_pairs,
    )

    def vec(i):
        # deterministic pseudo-random 64-dim vector from md5(i, d)
        return [
            (int(hashlib.md5(f"v{i}d{d}".encode()).hexdigest()[:6], 16)
             % 2001 - 1000) / 1000.0
            for d in range(64)
        ]

    rows = [(i, vec(i), 0) for i in range(398)]
    rows.append((398, vec(0), 0))   # planted dup of 0
    rows.append((399, vec(7), 0))   # planted dup of 7
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    wide = _banded_candidate_pairs(df).select("id_a", "id_b")
    narrow = _banded_candidate_pairs(df, band_bits=8).select("id_a", "id_b")
    n_wide, n_narrow = wide.count(), narrow.count()
    assert n_narrow * 4 <= n_wide, (n_wide, n_narrow)
    got = {(r.id_a, r.id_b) for r in narrow.collect()}
    assert (0, 398) in got and (7, 399) in got


def test_x137_triangle_census_matches_python_recount(spark):
    """x137's triangle/triad counts re-derived in pure Python from the
    same x44 edge list (set intersections over the collected undirected
    edges — fine at sf0.001's ~100 vectors), plus the cc bounds."""
    from ask_duckdb_spark.operators import QUERIES
    from tests.conftest import SF_DIR_001

    edges = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in QUERIES["x44_knn_graph"](spark, SF_DIR_001).collect()
    }
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if c > b
    )
    triads = sum(len(ns) * (len(ns) - 1) // 2 for ns in adj.values())

    row = QUERIES["x137_knn_clustering_coeff"](spark, SF_DIR_001).first()
    assert row.n_nodes == len(adj)
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert row.n_triads == triads
    assert 0 <= row.global_cc_ppm <= 1_000_000
    assert row.global_cc_ppm == (3 * tri * 1_000_000) // max(triads, 1)
    # a healthy (non-random) embedding manifold is transitive: the
    # fixture's clustered embeddings must show SOME closure
    assert row.n_triangles > 0


def test_x137b_graph_form_row_equal_and_auto_band_sizing(spark):
    """(a) x137b (materialized edge list + degree-ordered forward
    counting) returns row-identical output to x137's raw-join form —
    the x125<->x129 twin discipline. (b) x137's stats-driven band
    sizing (VERDICT r7 item 2): at or below the calibration size the
    auto bits ARE the default (registered oracle holds); above it they
    grow ceil(log2(n/N0)), reproducing exactly the +4 bits r7's 10x
    trial had to apply out of the loop; and the auto-upsized invocation
    warns that the oracle is void."""
    import warnings

    from ask_duckdb_spark.operators import QUERIES
    from ask_duckdb_spark.operators.similarity import (
        AUTO_BAND_N0,
        BAND_BITS,
        _auto_band_bits,
    )
    from tests.conftest import SF_DIR_001

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        a = QUERIES["x137_knn_clustering_coeff"](spark, SF_DIR_001).collect()
    assert not [x for x in w if "VOID" in str(x.message)], (
        "fixture-scale default invocation must keep the oracle pairing"
    )
    b = QUERIES["x137b_triangle_census_graph"](spark, SF_DIR_001).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]

    # sizing curve: default up to N0, +ceil(log2(n/N0)) above
    for n in (1, 500, 2000):
        assert _auto_band_bits(n) == BAND_BITS, n
    assert _auto_band_bits(AUTO_BAND_N0 * 10) == BAND_BITS + 4  # r7 trial
    assert _auto_band_bits(AUTO_BAND_N0 * 2) == BAND_BITS + 1
    assert _auto_band_bits(AUTO_BAND_N0 * 100) == BAND_BITS + 7


def test_banded_pairs_bucket_cap_default_noop_and_skew_guard(spark):
    """KNN_MAX_BUCKET gate (VERDICT r8 item 3 — the x44 candidate wall):

    (a) the DEFAULT cap must be a no-op at fixture scale, so every
        registered oracle pairing (x7b/x44/x69/x137) is untouched —
        pair-set identity against an effectively-uncapped run;
    (b) a BINDING cap must degrade gracefully: at sf0.001 the default
        bits put ~62 vectors in an average bucket (max 88), so cap=80
        drops only the largest buckets — candidate volume must fall
        while recall vs the uncapped candidate set stays >= 0.9
        (measured 0.963; the dropped pairs are the lowest-information
        collisions, the same trade x2's MAX_BUCKET makes).
    """
    from ask_duckdb_spark.operators.similarity import _banded_candidate_pairs
    from ask_duckdb_spark.sources.catalog import load_table
    from tests.conftest import SF_DIR_001

    emb = load_table(spark, SF_DIR_001, "embeddings")

    def pairs(**kw):
        return {
            (r.id_a, r.id_b)
            for r in _banded_candidate_pairs(emb, keep_self=True, **kw)
            .select("id_a", "id_b")
            .collect()
        }

    uncapped = pairs(max_bucket=10**9)
    assert pairs() == uncapped  # (a) default cap never binds on fixtures
    capped = pairs(max_bucket=80)
    assert len(capped) < len(uncapped)  # (b) the guard actually guards
    assert len(capped & uncapped) / len(uncapped) >= 0.9


def test_ivf_knn_graph_recall_vs_brute_force(spark):
    """The IVF-candidate scale path (VERDICT r9 item 3) gated exactly
    like the banded x44: >= 0.8 recall of the exact brute-force graph
    and near-complete per-vector coverage, at the default (test-SF)
    cell count. The banded form stays the registered default; this
    floor is what licenses swapping candidate generators at scale."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from ask_duckdb_spark.functions.vectors import cosine_similarity
    from ask_duckdb_spark.operators.similarity import (
        KNN_K,
        ivf_knn_graph,
    )
    from ask_duckdb_spark.sources.catalog import load_table

    emb = load_table(spark, SF_DIR_001, "embeddings")
    a = emb.select(F.col("vec_id").alias("src"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("dst"), F.col("embedding").alias("eb"))
    w = W.partitionBy("src").orderBy(F.col("sim").desc(), "dst")
    exact = {
        (r.src, r.dst)
        for r in a.crossJoin(b)
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst", cosine_similarity("ea", "eb").alias("sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
        .collect()
    }
    got = {
        (r.src, r.dst) for r in ivf_knn_graph(spark, SF_DIR_001).collect()
    }
    n_vec = emb.count()
    assert len(got) >= 0.95 * n_vec * KNN_K, "IVF graph starves vectors"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.8, f"ivf knn-graph recall {recall} below floor"


def test_triangle_census_ivf_schema_and_sanity(spark):
    """The IVF census shares x137b's census code (_census_from_knn),
    so schema and internal identities must hold; counts are the IVF
    graph's own (approximate vs x137b by construction)."""
    from ask_duckdb_spark.operators.similarity import triangle_census_ivf

    rows = triangle_census_ivf(spark, SF_DIR_001).collect()
    assert len(rows) == 1
    r = rows[0]
    assert list(rows[0].asDict()) == [
        "n_nodes", "n_edges", "n_triangles", "n_triads", "global_cc_ppm",
    ]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert 0 <= r.n_triangles and r.n_triads >= r.n_triangles
    assert 0 <= r.global_cc_ppm <= 1_000_000


def test_triangle_census_ivf_diagnostic_parity_vs_banded(spark):
    """IVF-vs-banded census tolerance gate (VERDICT r10 item 5): the
    IVF census is a corpus-health DIAGNOSTIC, so its reading must
    track the banded (oracle-pinned) census within stated bounds on
    the sf0.001 graph — a future IVF change that degrades the
    diagnostic fails here instead of silently shifting SCALE.md prose.
    Measured r11 baseline: edges 982 vs 985 (0.31%), triangles 31 vs
    31, cc_ppm 28756 vs 28748 (0.03%); bounds leave headroom for the
    ~9% cc / ~10% triangle deltas seen at trial ×1 (SCALE.md r10)
    without admitting a broken graph. (sf0.001 — conftest.SF_DIR; at
    sf0.01 the deltas widen to ~15% cc, the trial-×1 regime.)"""
    from ask_duckdb_spark.operators.registry import QUERIES
    from ask_duckdb_spark.operators.similarity import triangle_census_ivf
    from tests.conftest import SF_DIR

    ivf = triangle_census_ivf(spark, SF_DIR).collect()[0]
    banded = QUERIES["x137b_triangle_census_graph"](
        spark, SF_DIR
    ).collect()[0]
    assert ivf.n_nodes == banded.n_nodes
    assert abs(ivf.n_edges - banded.n_edges) <= 0.02 * banded.n_edges
    assert abs(ivf.n_triangles - banded.n_triangles) <= max(
        0.20 * banded.n_triangles, 2
    )
    assert (
        abs(ivf.global_cc_ppm - banded.global_cc_ppm)
        <= 0.10 * banded.global_cc_ppm
    )
