"""Semantic gates for the round-5 operators x66/x68.

Both carry full value-hashed oracles (scripts/diffcheck.py); these
tests pin the SEMANTIC invariants the oracle equality can't see, on
hand-built corpora where the right answer is known by construction:
x68 must flag exactly cross-document (never intra-document) repeated
windows, and x66 must rank target-domain-looking raw docs above
off-domain ones.
"""

from __future__ import annotations

import pytest

from ask_duckdb_spark.operators import QUERIES


def _write_documents(spark, tmpdir: str, rows: list[tuple[int, str, str]]):
    """Write a (doc_id, text, source) corpus in the fixture layout."""
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{tmpdir}/documents.parquet"
    )


@pytest.fixture(scope="module")
def span_corpus(spark, tmp_path_factory):
    """doc 0 and doc 1 share one exact 9-token span (=> 2 shared
    8-token windows each); doc 2 repeats a span only WITHIN itself;
    doc 3 is fully unique. Every doc is 16 tokens => 9 windows."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8 s9"
    intra = "r1 r2 r3 r4 r5 r6 r7 r8"
    rows = [
        (0, f"a1 a2 a3 a4 a5 a6 a7 {shared}", "srcA"),
        (1, f"{shared} b1 b2 b3 b4 b5 b6 b7", "srcA"),
        (2, f"{intra} {intra}", "srcA"),
        (3, " ".join(f"u{i}" for i in range(16)), "srcA"),
    ]
    d = tmp_path_factory.mktemp("x68corpus")
    _write_documents(spark, str(d), rows)
    return str(d)


def test_x68_flags_cross_document_spans_only(spark, span_corpus):
    out = {
        r.doc_id: r
        for r in QUERIES["x68_repeated_window_spans"](
            spark, span_corpus
        ).collect()
    }
    assert set(out) == {0, 1, 2, 3}
    # 16 tokens, width 8, stride 1 => 9 windows per doc.
    assert all(out[i].n_windows == 9 for i in out)
    # The shared 9-token run contributes exactly its 2 complete 8-token
    # windows to BOTH docs; windows straddling the unique prefixes
    # cannot collide.
    assert out[0].n_dup_windows == 2
    assert out[1].n_dup_windows == 2
    assert out[0].dup_ratio == pytest.approx(2 / 9)
    # Intra-document repetition is NOT cross-document duplication.
    assert out[2].n_dup_windows == 0
    assert out[3].n_dup_windows == 0


@pytest.fixture(scope="module")
def dsir_corpus(spark, tmp_path_factory):
    """Target domain (src0) speaks vocabulary A; the raw pool holds one
    pure-A doc (id 100), one pure-B doc (id 101), and a half-half doc
    (id 102). DSIR must order their weights 100 > 102 > 101."""
    a = " ".join(f"alpha{i % 5} beta{i % 3}" for i in range(20))
    b = " ".join(f"zeta{i % 5} eta{i % 3}" for i in range(20))
    half = (
        " ".join(f"alpha{i % 5} beta{i % 3}" for i in range(10))
        + " "
        + " ".join(f"zeta{i % 5} eta{i % 3}" for i in range(10))
    )
    rows = [(i, a, "src0") for i in range(10)] + [
        (100, a, "src1"),
        (101, b, "src1"),
        (102, half, "src1"),
    ]
    d = tmp_path_factory.mktemp("x66corpus")
    _write_documents(spark, str(d), rows)
    return str(d)


def test_x66_ranks_target_domain_docs_first(spark, dsir_corpus):
    rows = QUERIES["x66_dsir_importance"](spark, dsir_corpus).collect()
    w = {r.doc_id: r.dsir_logweight for r in rows}
    # Only raw-pool docs are scored; src0 never appears in the output.
    assert set(w) == {100, 101, 102}
    assert w[100] > w[102] > w[101]
    # The pure-target doc must score positive (more target-like than
    # raw-like), the pure-off-domain doc negative.
    assert w[100] > 0 > w[101]


def test_x70_iterations_move_the_codebook(spark):
    """Three Lloyd rounds must produce a DIFFERENT codebook than x27's
    one-step refinement (else the loop is vacuous), every cell must
    survive with members, and each centroid must stay 64-dim."""
    from ask_duckdb_spark.operators.similarity import (
        N_CELLS,
        _ivf_centroids,
    )
    from tests.conftest import SF_DIR_001

    rows = QUERIES["x70_kmeans_lloyd"](spark, SF_DIR_001).collect()
    assert len(rows) == N_CELLS * 64
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append((r.pos, r.centroid_val))
        assert r.n_members > 0
    assert len(by_cell) == N_CELLS

    from ask_duckdb_spark.sources.catalog import load_table

    one_step = {
        r["cell"]: list(r["cv"])
        for r in _ivf_centroids(
            load_table(spark, SF_DIR_001, "embeddings")
        ).collect()
    }
    moved = any(
        [v for _, v in sorted(by_cell[c])] != one_step[c] for c in one_step
    )
    assert moved, "3 Lloyd rounds produced x27's 1-step codebook"
