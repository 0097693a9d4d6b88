"""x67 BPE merge learning vs a pure-Python reference implementation.

x67 has no SQL oracle (the K-round argmax->rewrite loop is genuinely
iterative), so THIS is its correctness gate: the distributed learner
must produce exactly the merge table of a from-scratch sequential BPE
(Sennrich et al. 2016) on the same corpus — same pairs, same order,
same frequencies.
"""

from __future__ import annotations

import collections
import re

import pyarrow.parquet as pq

from tests.conftest import SF_DIR


def _ref_bpe(texts: list[str], k: int) -> list[tuple[int, str, str, int]]:
    """Sequential reference BPE with the same conventions as x67:
    whitespace tokens of the lowercased text, frequency-weighted
    vocabulary, tie-break (freq DESC, l, r), greedy left-to-right
    merge."""
    wf: collections.Counter[str] = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                wf[w] += 1
    syms: dict[str, list[str]] = {w: list(w) for w in wf}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, k + 1):
        pc: collections.Counter[tuple[str, str]] = collections.Counter()
        for w, f in wf.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (left, right), freq = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )[0]
        merges.append((rank, left, right, freq))
        lr = left + right
        for w, s in syms.items():
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = lr
                else:
                    out.append(x)
            syms[w] = out
    return merges


def test_x67_matches_reference_bpe(spark):
    from ask_duckdb_spark.operators import QUERIES
    from ask_duckdb_spark.operators.textstats import BPE_MERGES

    texts = pq.read_table(
        f"{SF_DIR}/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    expected = _ref_bpe(texts, BPE_MERGES)
    assert len(expected) == BPE_MERGES  # non-vacuous: corpus yields K merges

    got = [
        (r["merge_rank"], r["lhs"], r["rhs"], int(r["freq"]))
        for r in QUERIES["x67_bpe_learn"](spark, SF_DIR).collect()
    ]
    assert got == expected

    # The learner must actually COMPOSE merges: at least one learned
    # symbol should be longer than 2 chars' worth of a first-round
    # merge (i.e. some (l, r) where one side is itself a merged symbol).
    assert any(len(l) > 1 or len(r) > 1 for _, l, r, _ in got)
