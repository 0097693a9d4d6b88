"""Positional retrieval + statistical-audit operators (x125-x132).

Round-6 tail of the training-data-pipeline surface (SURVEY.md §2.9),
capabilities the registry did not yet express:

* x125 — exact PHRASE match over the corpus: positional semantics, the
  query class BM25's bag-of-words scoring (x76) cannot answer. The
  registered plan is the scan-shaped variant (phrase counting as a
  pure array expression per document — zero shuffles); the
  postings-join variant you'd run against a materialized positional
  index is described in the docstring.
* x126 — functional-dependency audit ("does A determine B?") as ONE
  scan of the table: the profiling step that picks merge/partition
  keys and catches denormalization bugs before a 100 TB backfill.
* x127 — Pearson correlation matrix over lineitem's numeric columns
  from ONE scan of integer-quantized sufficient statistics.
* x128 — winsorized (p05/p95) robust group statistics with exact
  rank-selection bounds (no float percentile interpolation anywhere);
* x129 — x125's phrase answer from the positional-postings plan (the
  index/serving shape), row-equality-pinned to the scan shape;
* x130 — Benford first-significant-digit audit (fabricated/synthetic
  amount screen) with plan-time integer expectation constants;
* x131 — collocation mining: top adjacent-token pairs by integer LIFT
  (monotone in PMI, so no float log), the tokenizer-merge/multi-word
  vocabulary signal;
* x132 — per-source two-sample Kolmogorov-Smirnov drift in exact
  integers (max |cum_s·n_rest − cum_rest·n_s|), the distribution-shape
  ingest QA check mean/MAD screens miss.

Float-output discipline (tests/test_float_portability.py, _util.py):
per-row integer quantization -> exact BIGINT sums -> one identical
closing IEEE scalar sequence on both engines. x127 injects the SAME
generated expression string into the Spark plan and the DuckDB oracle,
so the closing sequences cannot drift apart by construction.

Reference parity note: the reference (PalNilsson/ask-duckdb) exposes
no retrieval or profiling surface of its own — these extend the §2.9
pipeline families (x76 BM25, x103 profile, x104 MAD) along axes a
100 TB corpus build needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.catalog import load_table
from ._util import unpersist_with
from .registry import query
from .textstats import _TOKENS_ORACLE

# ---------------------------------------------------------------------------
# x125 — exact phrase match
# ---------------------------------------------------------------------------

#: The registered phrase (a deterministic fixture query, like
#: BM25_TERMS). The callable builds the same plan for any k-word
#: phrase — `_phrase_count` chains one position test per word.
PHRASE: tuple[str, ...] = ("table", "scan")


def _phrase_count(arr, phrase: tuple[str, ...]):
    """Occurrences of ``phrase`` (consecutive tokens) in array column
    ``arr`` — overlapping matches count, matching the oracle exactly.

    Pure array expression: ``sequence`` over candidate start positions,
    one ``get`` per phrase word (0-based, null-safe OOB). Guarded for
    short documents because Spark's ``sequence(a, b)`` DESCENDS when
    ``b < a`` rather than returning empty.
    """
    k = len(phrase)

    def is_match(i):
        cond = F.get(arr, i) == phrase[0]
        for j in range(1, k):
            cond = cond & (F.get(arr, i + j) == phrase[j])
        return cond

    return (
        F.when(
            F.size(arr) >= k,
            F.size(F.filter(F.sequence(F.lit(0), F.size(arr) - k), is_match)),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )


def _phrase_oracle(phrase: tuple[str, ...]) -> str:
    k = len(phrase)
    conds = " AND ".join(f"t[i+{j}] = '{w}'" for j, w in enumerate(phrase))
    return rf"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_ORACLE} AS t FROM documents
    ), hits AS (
      SELECT doc_id,
             len(list_filter(range(1, len(t) - {k - 2}), i -> {conds}))
               AS n_occurrences
      FROM tok
    )
    SELECT doc_id, CAST(n_occurrences AS BIGINT) AS n_occurrences
    FROM hits WHERE n_occurrences > 0
    ORDER BY n_occurrences DESC, doc_id
    """


@query("x125_phrase_match", oracle=_phrase_oracle(PHRASE))
def x125_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents containing the exact phrase ``PHRASE``, with counts.

    Positional retrieval: a phrase query needs token ADJACENCY, which
    x76's bag-of-words postings can't see ("table scan" != a document
    mentioning both words pages apart). Counted per document as a pure
    array expression over the shared tokenizer — one position test per
    phrase word, overlapping occurrences counted.

    Scale (100 TB): the counting is a zero-shuffle scan — phrase
    evaluation is embarrassingly parallel per document and pipelines
    into the parquet read (WholeStageCodegen; only matching (doc_id,
    count) rows leave the scan, so the exchange feeding the final
    order-by carries hit rows only). For interactive phrase QPS you'd
    instead materialize a POSITIONAL postings index once — ``posexplode
    (tokens)`` -> (tok, doc_id, pos), bucketed by tok — and answer
    phrases with a per-word postings lookup joined on (doc_id, pos +
    offset): the join keys on the rarest word's postings, so the work
    is O(postings of the rarest word), not O(corpus). Same trade as
    x76's docstring (scan-shaped registered entry, index-shaped serving
    path).
    """
    import re as _re

    d = load_table(spark, sf_dir, "documents")
    # Candidate prefilter (r7): a doc can only contain the phrase as
    # consecutive tokens if lower(text) matches the words joined by
    # whitespace. The regex is a strict SUPERSET of the token-adjacency
    # predicate (e.g. 'notable scan' matches the regex but tokenizes to
    # 'notable' != 'table'), so correctness is untouched — the exact
    # positional count below still decides — but the expensive
    # tokenize + per-position scan now runs on hit candidates only.
    # Measured at sf0.1: 3.16 s -> the regexp scan dominates instead
    # (~0.3 s), a 10x cut; at 100 TB this is the difference between a
    # full tokenize of the corpus and a byte-scan with early-out.
    pre = r"[ \t\n\r\x0B\f]+".join(_re.escape(w) for w in PHRASE)
    # r13 note: a widen() ahead of this filter was tried (parallelize
    # the byte scan across cores at fixture scale) and MEASURED SLOWER
    # (+27% interleaved A/B): the repartition exchange of the raw text
    # costs more than the single-core regex saves at this volume, and
    # at 100 TB the scan is naturally parallel anyway. Kept zero-shuffle.
    cand = d.filter(F.lower(F.col("text")).rlike(pre))
    t = cand.select("doc_id", tokens(F.col("text")).alias("t"))
    hits = t.select(
        "doc_id", _phrase_count(F.col("t"), PHRASE).alias("n_occurrences")
    )
    return hits.filter(F.col("n_occurrences") > 0).orderBy(
        F.desc("n_occurrences"), "doc_id"
    )


# ---------------------------------------------------------------------------
# x129 — phrase match, positional-postings plan (x125's serving twin)
# ---------------------------------------------------------------------------


@query("x129_phrase_postings", oracle=_phrase_oracle(PHRASE))
def x129_phrase_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """x125's answer from a POSITIONAL POSTINGS plan — the index shape.

    Same contract as x125 (identical oracle; pytest pins row equality),
    different physical strategy: explode to (doc_id, pos, tok)
    postings, keep only the phrase's words (the filter lands before
    any shuffle, so the exchange carries |phrase-word postings|, not
    the corpus), then intersect the words' posting lists on aligned
    start position — word j matches at ``start = pos - j`` — with one
    equi-join per phrase word. A phrase occurrence is a (doc_id,
    start) surviving all joins; overlaps count, as in x125.

    This is the plan you run against a MATERIALIZED index: with
    postings written once, bucketed by tok, a phrase query reads only
    the phrase words' buckets and the joins are shuffle-free bucket
    joins driven by the rarest word. The registered entry rebuilds the
    postings from the corpus per call (no persisted state in the
    registry contract), which costs one scan — x125 is the better plan
    for that one-shot case; this entry exists to pin that the index
    shape returns the SAME answer, the x2/x3-style twin discipline.
    """
    d = load_table(spark, sf_dir, "documents")
    post = d.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).filter(F.col("tok").isin(*set(PHRASE)))
    m: DataFrame | None = None
    for j, w in enumerate(PHRASE):
        pj = post.filter(F.col("tok") == w).select(
            "doc_id", (F.col("pos") - F.lit(j)).alias("start")
        )
        m = pj if m is None else m.join(pj, ["doc_id", "start"])
    return (
        m.groupBy("doc_id")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "doc_id")
    )


# ---------------------------------------------------------------------------
# x126 — functional-dependency audit
# ---------------------------------------------------------------------------

#: Candidate FDs (lhs -> rhs) audited on orders: the key FD (holds by
#: construction), two plausible-but-false pipeline assumptions, and a
#: low-cardinality pair. Any column list works — the audit is
#: |pairs| count-distincts in ONE scan.
FD_PAIRS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderstatus"),
    ("o_orderstatus", "o_orderpriority"),
)


def _fd_oracle() -> str:
    aggs, picks = [], []
    for i, (a, b) in enumerate(FD_PAIRS):
        aggs.append(f"count(DISTINCT {a}) AS nl_{i}")
        # NULL semantics: rows with NULL lhs are outside the audit (a
        # NULL key determines nothing — matching count(DISTINCT lhs),
        # which also drops NULLs), while a NULL rhs is a real value the
        # lhs maps to. The pair domain is counted STRUCTURALLY —
        # count(DISTINCT (a, b)) over the row value — so no string
        # image exists to collide: a '#' inside a value or a literal
        # '\\x01' rhs (the old sentinel encoding's two ambiguities,
        # ADVICE r7) cannot conflate distinct pairs, and a NULL rhs is
        # a distinct field value inside a non-NULL struct.
        aggs.append(
            f"count(DISTINCT ({a}, {b})) "
            f"FILTER (WHERE {a} IS NOT NULL) AS np_{i}"
        )
        picks.append(
            f"SELECT '{a}' AS lhs, '{b}' AS rhs, "
            f"CAST(nl_{i} AS BIGINT) AS n_lhs, "
            f"CAST(np_{i} AS BIGINT) AS n_pairs, "
            f"CAST(np_{i} - nl_{i} AS BIGINT) AS n_extra, "
            f"np_{i} = nl_{i} AS fd_holds FROM a"
        )
    union = "\nUNION ALL\n".join(picks)
    return f"""
    WITH a AS (
      SELECT {", ".join(aggs)} FROM orders
    )
    SELECT * FROM ({union}) ORDER BY lhs, rhs
    """


@query("x126_fd_audit", oracle=_fd_oracle())
def x126_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit over ``FD_PAIRS`` on orders.

    A -> B holds iff ``count(distinct A) == count(distinct (A, B))``;
    ``n_extra`` counts the (A, B) combinations beyond one-per-A — the
    violation mass. This is the pre-backfill check that a proposed
    merge key actually determines the payload (x116's MERGE assumes
    source keys are unique; x114 audits FK *coverage*; this audits
    *determinism*).

    Scale (100 TB): ONE scan — all 2|pairs| exact distincts evaluate in
    a single Expand-based aggregate (the same single-pass shape as
    x103's profiler), so the audit costs one pass regardless of how
    many candidate FDs are tested. The pair domain is counted
    structurally — count(DISTINCT (a, b)) on both engines — so it is
    injective on ANY data, including values containing the retired
    string image's '#' delimiter or a literal '\\x01' rhs (ADVICE r7).
    At petabyte row counts you'd swap exact
    distincts for HLL sketches (g10 / x120 show the pattern) — the FD
    verdict then carries the sketch's error bound.
    """
    o = load_table(spark, sf_dir, "orders")
    aggs = []
    for i, (a, b) in enumerate(FD_PAIRS):
        aggs.append(F.countDistinct(F.col(a)).alias(f"nl_{i}"))
        # Mirror the oracle's NULL semantics structurally: NULL lhs
        # rows are outside the audit (count(DISTINCT) drops the NULL
        # struct the when() yields); a NULL rhs is a distinct field
        # value inside a non-NULL struct — no sentinel encoding.
        aggs.append(
            F.countDistinct(
                F.when(F.col(a).isNotNull(), F.struct(F.col(a), F.col(b)))
            ).alias(f"np_{i}")
        )
    row = o.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', nl_{i}, np_{i}" for i, (a, b) in enumerate(FD_PAIRS)
    )
    return (
        row.selectExpr(
            f"stack({len(FD_PAIRS)}, {stack_args}) AS (lhs, rhs, n_lhs, n_pairs)"
        )
        .select(
            "lhs",
            "rhs",
            F.col("n_lhs").cast("bigint").alias("n_lhs"),
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            (F.col("n_pairs") - F.col("n_lhs")).cast("bigint").alias("n_extra"),
            (F.col("n_pairs") == F.col("n_lhs")).alias("fd_holds"),
        )
        .orderBy("lhs", "rhs")
    )


# ---------------------------------------------------------------------------
# x127 — single-scan Pearson correlation matrix
# ---------------------------------------------------------------------------

#: (name, quantized-unit SQL/Spark grid) of the profiled lineitem
#: numerics. Quantization grids are chosen so every sufficient
#: statistic fits int64 with headroom at sf1+ (see docstring):
#: quantity and whole DOLLARS for extendedprice, CENTS for the
#: two sub-unit rates.
CORR_COLS: tuple[tuple[str, str], ...] = (
    ("l_quantity", "floor(l_quantity + 0.5)"),
    ("l_extendedprice", "floor(l_extendedprice + 0.5)"),
    ("l_discount", "floor(l_discount * 100 + 0.5)"),
    ("l_tax", "floor(l_tax * 100 + 0.5)"),
)

#: Audited pairs (indices into CORR_COLS).
CORR_PAIRS: tuple[tuple[int, int], ...] = ((0, 1), (0, 2), (1, 2), (2, 3))


def _corr_expr(i: int, j: int) -> str:
    """The closing scalar sequence for pair (i, j) — ONE string,
    injected verbatim into BOTH engines' plans, over the exact integer
    sums ``n, s_{i}, s_{j}, ss_{i}, ss_{j}, sp_{i}_{j}``. Every operand
    is cast to DOUBLE first (identical IEEE rounding of identical
    integers), then the arithmetic is a fixed op sequence."""
    n, sx, sy = "CAST(n AS DOUBLE)", f"CAST(s_{i} AS DOUBLE)", f"CAST(s_{j} AS DOUBLE)"
    ssx, ssy = f"CAST(ss_{i} AS DOUBLE)", f"CAST(ss_{j} AS DOUBLE)"
    sp = f"CAST(sp_{i}_{j} AS DOUBLE)"
    num = f"({n} * {sp} - {sx} * {sy})"
    # NULLIF guards the zero-variance (constant-column) degenerate case:
    # without it 0/0 yields NaN, and the engines split downstream —
    # Spark's floor(NaN) returns a BIGINT that casts NaN to 0 while
    # DuckDB's floor(NaN) stays NaN. NULL/0 is NULL in both grammars,
    # so degenerate inputs close as NULL on BOTH engines (the x132
    # NULLIF discipline).
    den = (
        f"NULLIF(sqrt({n} * {ssx} - {sx} * {sx})"
        f" * sqrt({n} * {ssy} - {sy} * {sy}), 0e0)"
    )
    # Literal typing is the one dialect split a shared string can hit:
    # Spark parses `1000000.0` as DECIMAL (closing the whole sequence in
    # decimal arithmetic), DuckDB as DOUBLE. Scientific notation is
    # DOUBLE in BOTH grammars, so the sequence stays float end-to-end.
    return f"floor({num} / {den} * 1e6 + 5e-1) / 1e6"


def _corr_oracle() -> str:
    units = [f"CAST({u} AS BIGINT) AS u_{i}" for i, (_, u) in enumerate(CORR_COLS)]
    aggs = ["count(*) AS n"]
    for i in range(len(CORR_COLS)):
        aggs.append(f"sum(u_{i}) AS s_{i}")
        aggs.append(f"sum(u_{i} * u_{i}) AS ss_{i}")
    for i, j in CORR_PAIRS:
        aggs.append(f"sum(u_{i} * u_{j}) AS sp_{i}_{j}")
    picks = [
        f"SELECT '{CORR_COLS[i][0]}' AS col_x, '{CORR_COLS[j][0]}' AS col_y, "
        f"CAST(n AS BIGINT) AS n_rows, {_corr_expr(i, j)} AS corr FROM a"
        for i, j in CORR_PAIRS
    ]
    union = "\nUNION ALL\n".join(picks)
    return f"""
    WITH q AS (
      SELECT {", ".join(units)} FROM lineitem
    ), a AS (
      SELECT {", ".join(aggs)} FROM q
    )
    SELECT * FROM ({union}) ORDER BY col_x, col_y
    """


@query("x127_corr_matrix", oracle=_corr_oracle())
def x127_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations among lineitem numerics, ONE scan, exact.

    The feature-engineering sanity check (collinear columns, leaky
    features) computed the portable way: each input is quantized to an
    exact integer grid per row (whole units for quantity, DOLLARS for
    extendedprice, CENTS for the rates — lossless for discount/tax,
    a documented 1-dollar grid for price), every sufficient statistic
    (n, Sx, Sxx, Sxy) is an order-independent BIGINT sum, and the
    closing ``(n·Sxy − Sx·Sy) / √(n·Sxx − Sx²)·√(n·Syy − Sy²)`` is ONE
    generated expression string injected into BOTH engines — the
    sequences cannot diverge by construction (the x28b lesson; Spark's
    own ``corr()`` is a float accumulation and is exactly what this op
    avoids in hashed output).

    int64 headroom: the largest statistic is Σ ep_dollars² ≤ n·1.1e10 —
    safe through sf10 (6e7 rows -> 6.6e17 < 9.2e18). Beyond that, or
    for 100 TB, widen the squared sums to decimal(38,0) (Spark) /
    HUGEINT (DuckDB): same plan, same one-scan shape. All 4+2·|pairs|
    sums evaluate in a single partial-aggregate pass (map-side combine;
    bytes shuffled = one row of sums per partition).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = li.selectExpr(
        *[f"CAST({u} AS BIGINT) AS u_{i}" for i, (_, u) in enumerate(CORR_COLS)]
    )
    aggs = [F.count("*").alias("n")]
    for i in range(len(CORR_COLS)):
        aggs.append(F.sum(F.col(f"u_{i}")).alias(f"s_{i}"))
        aggs.append(F.sum(F.col(f"u_{i}") * F.col(f"u_{i}")).alias(f"ss_{i}"))
    for i, j in CORR_PAIRS:
        aggs.append(F.sum(F.col(f"u_{i}") * F.col(f"u_{j}")).alias(f"sp_{i}_{j}"))
    a = q.agg(*aggs)
    # One result struct per pair, exploded off the single sums row — the
    # aggregate evaluates ONCE (vs a per-pair UNION re-scanning it).
    structs = [
        F.struct(
            F.lit(CORR_COLS[i][0]).alias("col_x"),
            F.lit(CORR_COLS[j][0]).alias("col_y"),
            F.col("n").cast("bigint").alias("n_rows"),
            F.expr(_corr_expr(i, j)).alias("corr"),
        )
        for i, j in CORR_PAIRS
    ]
    return (
        a.select(F.explode(F.array(*structs)).alias("s"))
        .select("s.*")
        .orderBy("col_x", "col_y")
    )


# ---------------------------------------------------------------------------
# x128 — winsorized robust group statistics
# ---------------------------------------------------------------------------


@query(
    "x128_winsorized_stats",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS rf,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
      FROM lineitem
    ), r AS (
      SELECT rf, v,
             row_number() OVER (PARTITION BY rf ORDER BY v) AS rn,
             count(*)    OVER (PARTITION BY rf) AS n
      FROM v
    ), b AS (
      SELECT rf,
             max(CASE WHEN rn = greatest(1, (n * 5 + 99) // 100)
                 THEN v END) AS lo,
             max(CASE WHEN rn = (n * 95 + 99) // 100
                 THEN v END) AS hi,
             max(n) AS n
      FROM r GROUP BY rf
    ), c AS (
      SELECT v.rf, b.lo, b.hi, b.n,
             greatest(b.lo, least(b.hi, v.v)) AS cv,
             CASE WHEN v.v < b.lo THEN 1 ELSE 0 END AS is_lo,
             CASE WHEN v.v > b.hi THEN 1 ELSE 0 END AS is_hi
      FROM v JOIN b USING (rf)
    )
    SELECT rf AS l_returnflag,
           CAST(max(n) AS BIGINT) AS n_rows,
           (CAST(max(lo) AS DOUBLE) / 100.0) AS lo_bound,
           (CAST(max(hi) AS DOUBLE) / 100.0) AS hi_bound,
           (CAST(sum(cv) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 100.0)
             AS winsorized_mean,
           CAST(sum(is_lo) AS BIGINT) AS n_clamped_lo,
           CAST(sum(is_hi) AS BIGINT) AS n_clamped_hi
    FROM c GROUP BY rf ORDER BY rf
    """,
)
def x128_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (p05/p95) mean of extendedprice per returnflag.

    Robust statistics without float percentile interpolation: the
    bounds are EXACT RANK SELECTIONS — the cents value at sorted rank
    ``max(1, ceil(0.05·n))`` / ``ceil(0.95·n)`` within each group —
    so both bounds are actual data values (integers), the clamp is
    integer, and the winsorized mean is an exact BIGINT sum closed by
    two deterministic divisions. No engine quantile function appears
    on either side (Spark ``percentile`` and DuckDB ``quantile_cont``
    interpolate in float and need not agree to the last ulp).

    Ties: ``row_number`` over equal values assigns ranks arbitrarily,
    but the VALUE at any rank of the sorted multiset is
    order-independent, so the selected bounds are deterministic.

    Scale (100 TB): one hash-partition by group + in-partition sort
    (the window), then a group-local aggregate and a bounds broadcast
    back onto the rows (Spark picks broadcast for the |groups|-row
    ``b``). Groups here are 3 flags — at real scale you'd winsorize
    per (source, day) so groups are many and the window sort
    distributes; for single giant groups use x37's approximate
    quantile bounds instead (documented trade: approx bounds, exact
    clamp-mean either way).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("v"),
    )
    w = Window.partitionBy("rf")
    r = li.select(
        "rf",
        "v",
        F.row_number().over(w.orderBy("v")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    # ceil(n*k/100) in EXACT integer arithmetic: `ceil(n * 0.05)` is a
    # divergence trap — Spark evaluates the literal as an inexact
    # DOUBLE while DuckDB's DECIMAL stays exact, and at boundary
    # multiples the double product can land one ulp over the integer
    # (measured: q=0.55 splits at n=100/180/200/...). Integer
    # (n*k + 99) div 100 is bit-identical everywhere by construction.
    lo_rank = F.greatest(
        F.lit(1).cast("bigint"), F.expr("(n * 5 + 99) DIV 100")
    )
    hi_rank = F.expr("(n * 95 + 99) DIV 100")
    b = r.groupBy("rf").agg(
        F.max(F.when(F.col("rn") == lo_rank, F.col("v"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("v"))).alias("hi"),
        F.max("n").alias("n"),
    )
    c = li.join(b, "rf").select(
        "rf",
        "lo",
        "hi",
        "n",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("v"))).alias("cv"),
        F.when(F.col("v") < F.col("lo"), 1).otherwise(0).alias("is_lo"),
        F.when(F.col("v") > F.col("hi"), 1).otherwise(0).alias("is_hi"),
    )
    return (
        c.groupBy("rf")
        .agg(
            F.max("n").cast("bigint").alias("n_rows"),
            (F.max("lo").cast("double") / F.lit(100.0)).alias("lo_bound"),
            (F.max("hi").cast("double") / F.lit(100.0)).alias("hi_bound"),
            (
                F.sum("cv").cast("double")
                / F.max("n").cast("double")
                / F.lit(100.0)
            ).alias("winsorized_mean"),
            F.sum("is_lo").cast("bigint").alias("n_clamped_lo"),
            F.sum("is_hi").cast("bigint").alias("n_clamped_hi"),
        )
        .withColumnRenamed("rf", "l_returnflag")
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# x130 — Benford first-digit audit
# ---------------------------------------------------------------------------

import math as _math

#: Benford expectation log10(1 + 1/d) in exact parts-per-million,
#: computed once at import (plan-time constants injected into BOTH
#: engines — no runtime float log anywhere).
BENFORD_PPM: dict[int, int] = {
    d: _math.floor(_math.log10(1 + 1 / d) * 1_000_000 + 0.5) for d in range(1, 10)
}

_BENFORD_CASE = (
    "CASE first_digit "
    + " ".join(f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items())
    + " END"
)


@query(
    "x130_benford_audit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS first_digit
      FROM orders WHERE o_totalprice >= 1
    ), c AS (
      SELECT first_digit, count(*) AS n_obs FROM d GROUP BY 1
    ), t AS (
      SELECT sum(n_obs) AS n FROM c
    )
    SELECT first_digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST((n_obs * 1000000) // n AS BIGINT) AS obs_ppm,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
           CAST((n_obs * 1000000) // n - {_BENFORD_CASE} AS BIGINT) AS dev_ppm
    FROM c CROSS JOIN t ORDER BY first_digit
    """,
)
def x130_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of o_totalprice vs Benford.

    The classic fabricated/synthetic-data screen (Benford 1938; Nigrini
    1996 for audit use): naturally-occurring multiplicative amounts
    follow P(d) = log10(1 + 1/d); flat or truncated digit profiles
    flag generated, capped, or unit-mixed columns before they poison
    downstream statistics. (The TPC-H-ish fixture is itself synthetic
    and the audit SHOWS it: digits 1-4 are ~uniform — a correct
    negative result.)

    Portability: the observed share is integer parts-per-million via
    integer division (``DIV``/``//``), and the Benford expectation is
    nine plan-time integer constants — no runtime float log on either
    engine. The whole audit is one scan + a 9-row aggregate; the total
    joins back as a broadcast of one row.
    """
    o = (
        load_table(spark, sf_dir, "orders")
        # Benford is defined on the first SIGNIFICANT digit of positive
        # magnitudes: values in [0, 1) floor to 0 (no CASE arm — NULL
        # expectation) and negatives would put '-' in the first byte,
        # so the audit's domain is amounts >= 1. For general columns
        # with sub-unit or negative values, rescale/abs() upstream.
        .filter(F.col("o_totalprice") >= 1)
        .select(
            F.substring(
                F.floor(F.col("o_totalprice")).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("first_digit")
        )
    )
    c = o.groupBy("first_digit").agg(F.count("*").alias("n_obs"))
    t = c.agg(F.sum("n_obs").alias("n"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "first_digit",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.expr("CAST((n_obs * 1000000) DIV n AS BIGINT)").alias("obs_ppm"),
            F.expr(f"CAST({_BENFORD_CASE} AS BIGINT)").alias("benford_ppm"),
            F.expr(
                f"CAST((n_obs * 1000000) DIV n - {_BENFORD_CASE} AS BIGINT)"
            ).alias("dev_ppm"),
        )
        .orderBy("first_digit")
    )


# ---------------------------------------------------------------------------
# x131 — collocation mining by integer lift
# ---------------------------------------------------------------------------

#: Minimum bigram count for a collocation candidate (noise floor).
MIN_COLLOC_COUNT = 10


@query(
    "x131_collocations",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, {{toks}} AS ts FROM documents
    ), cu AS (
      SELECT w, count(*) AS c
      FROM (SELECT unnest(ts) AS w FROM toks) GROUP BY 1
    ), n AS (
      SELECT sum(c) AS n_tok FROM cu
    ), cb AS (
      SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c_xy
      FROM (
        SELECT unnest(list_transform(range(1, len(ts)),
                      i -> struct_pack(w1 := ts[i], w2 := ts[i+1]))) AS b
        FROM toks WHERE len(ts) >= 2
      ) GROUP BY 1, 2
    )
    SELECT w1, w2, CAST(c_xy AS BIGINT) AS c_xy,
           CAST(cx.c AS BIGINT) AS c_x, CAST(cy.c AS BIGINT) AS c_y,
           CAST((((c_xy * 1000000) // cx.c) * n.n_tok) // cy.c AS BIGINT)
             AS lift_ppm
    FROM cb JOIN cu cx ON cb.w1 = cx.w JOIN cu cy ON cb.w2 = cy.w CROSS JOIN n
    WHERE c_xy >= {MIN_COLLOC_COUNT}
    ORDER BY lift_ppm DESC, w1, w2 LIMIT 20
    """.replace("{toks}", _TOKENS_ORACLE),
)
def x131_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent-token collocations by integer lift.

    Collocation mining (Manning & Schütze ch. 5) ranks word pairs by
    how much more often they co-occur than unigram independence
    predicts — the signal behind multi-word vocabulary entries and
    tokenizer merge candidates (x67's BPE learns the same structure
    bottom-up). PMI is log2 of the lift; since log is monotone, ranking
    by LIFT needs no float log at all. The contract statistic is

        lift_ppm = ((c_xy * 1e6) div c_x * N) div c_y

    — staged integer division (exact: ``c_xy <= c_x`` bounds stage one
    by 1e6, and ``stage1 * N`` stays in int64 up to N ≈ 9e12 tokens,
    ~40 TB of text; beyond that widen to decimal(38,0)/HUGEINT). Both
    engines evaluate the identical integer sequence, so the top-20 is
    hash-exact; ties break on the bigram itself.

    Scale (100 TB): two word-count-shaped combinable shuffles (unigram
    and bigram counts), two vocabulary-keyed joins (the unigram side is
    |vocab| rows — broadcast at fixture scale, exchange at web scale),
    and a TakeOrdered top-20: no global sort ever materializes. The
    ``c_xy >= {MIN_COLLOC_COUNT}`` floor prunes the candidate set
    before both joins.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.col("text")).alias("ts")
    )
    # The unigram-count frame feeds THREE consumers (both join sides
    # and the token total); unpersisted, Catalyst plans three full
    # tokenize+explode+count subtrees (four corpus scans total —
    # verified in the formatted plan). It is |vocab| rows — persist it
    # and tie the cache to the result's lifetime.
    cu = (
        d.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    n = cu.agg(F.sum("c").alias("n_tok"))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("ts") - 1),
        lambda i: F.struct(
            F.element_at("ts", i).alias("w1"),
            F.element_at("ts", i + 1).alias("w2"),
        ),
    )
    cb = (
        d.filter(F.size("ts") >= 2)
        .select(F.explode(bigrams).alias("b"))
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c_xy"))
        .filter(F.col("c_xy") >= MIN_COLLOC_COUNT)
    )
    cx = cu.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x")
    cy = cu.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y")
    result = (
        cb.join(cx, "w1")
        .join(cy, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c_xy").cast("bigint").alias("c_xy"),
            F.col("c_x").cast("bigint").alias("c_x"),
            F.col("c_y").cast("bigint").alias("c_y"),
            F.expr(
                "CAST((((c_xy * 1000000) DIV c_x) * n_tok) DIV c_y AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "w1", "w2")
        .limit(20)
    )
    return unpersist_with(result, cu)


# ---------------------------------------------------------------------------
# x132 — two-sample Kolmogorov-Smirnov drift, exact integers
# ---------------------------------------------------------------------------

#: Hard bound on the KS evaluation grid (VERDICT r11 item 6): the
#: metric is quantized to at most this many equal-width cells BEFORE
#: the |sources| x |grid| cross join, so an unbounded-cardinality
#: metric can never blow the grid — the discipline is enforced in the
#: plan, not just documented. Quantization is LOSSLESS whenever the
#: integer value span <= cells (consecutive values land in distinct
#: cells), which holds for n_chars at every test SF; when lossy, KS on
#: the 1e4-cell grid underestimates D by at most the largest single-
#: cell probability mass (~1e-4 for smooth distributions). Integer-DIV
#: arithmetic on both engines keeps the oracle in exact lockstep;
#: headroom: span * cells must fit int64 (span <= 9.2e14).
KS_GRID_CELLS = 10_000


@query(
    "x132_ks_drift",
    oracle=f"""
    WITH c0 AS (
      SELECT source, n_chars AS v, count(*) AS cs FROM documents GROUP BY 1, 2
    ), gb AS (
      SELECT min(v) AS mn, max(v) - min(v) + 1 AS span FROM c0
    ), c AS (
      SELECT source, ((v - mn) * {KS_GRID_CELLS}) // span AS v,
             sum(cs) AS cs
      FROM c0 CROSS JOIN gb GROUP BY 1, 2
    ), av AS (
      SELECT v, sum(cs) AS ca FROM c GROUP BY 1
    ), cuma AS (
      SELECT v, sum(ca) OVER (ORDER BY v) AS cum_all FROM av
    ), srcs AS (
      SELECT source, sum(cs) AS n_s FROM c GROUP BY 1
    ), tot AS (
      SELECT sum(n_s) AS n FROM srcs
    ), grid AS (
      SELECT s.source, s.n_s, av.v FROM srcs s CROSS JOIN av
    ), cums AS (
      SELECT g.source, g.n_s, g.v,
             sum(COALESCE(c.cs, 0)) OVER (PARTITION BY g.source ORDER BY g.v)
               AS cum_s
      FROM grid g LEFT JOIN c ON c.source = g.source AND c.v = g.v
    )
    SELECT cums.source,
           CAST(max(n_s) AS BIGINT) AS n_s,
           CAST(max(abs(cum_s * (t.n - n_s) - (cuma.cum_all - cum_s) * n_s))
                AS BIGINT) AS d_scaled,
           CAST((max(abs(cum_s * (t.n - n_s) - (cuma.cum_all - cum_s) * n_s))
                 * 1000000)
                // NULLIF(max(n_s) * (t.n - max(n_s)), 0) AS BIGINT)
             AS d_ppm
    FROM cums JOIN cuma USING (v) CROSS JOIN tot t
    GROUP BY cums.source, t.n
    ORDER BY d_ppm DESC, source
    """,
)
def x132_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source two-sample KS drift of the length distribution.

    For each source s, the Kolmogorov-Smirnov statistic between s's
    n_chars distribution and the REST of the corpus — the
    distribution-level ingest QA check that a mean/MAD screen (x104)
    and token-KL (x73) miss: KS sees shape (a bimodal source with the
    right mean still spikes). D = max_v |F_s(v) - F_rest(v)| computed
    in EXACT INTEGERS: with counts, ``|cum_s·n_rest − cum_rest·n_s|``
    is an integer whose maximum, floor-scaled to ppm by ``n_s·n_rest``,
    IS the statistic (verified against a numpy recompute to all
    printed digits). No floats anywhere, so the whole table is
    hash-exact.

    int64 headroom: ``cum·n ≤ n_s·n_rest ≤ (N/2)²`` and the ppm
    scaling multiplies by 1e6 — safe to N ≈ 6e6 rows per the scaled
    product, then widen to decimal(38,0)/HUGEINT (same plan). The
    statistic needs the cumulative merge only over the |distinct v| ×
    |sources| GRID (not the corpus): one corpus scan builds the
    (source, v) count frame, which is then quantized to at most
    KS_GRID_CELLS width_bucket-style cells (ENFORCED in the plan —
    see KS_GRID_CELLS; lossless at every test SF) and persisted (it
    feeds four consumers), after which every window and join runs on
    bounded grid-sized data.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    # Raw per-(source, value) counts: the only corpus-sized shuffle,
    # map-side combinable. Persisted because both the grid bounds and
    # the quantized re-aggregation read it.
    c0 = d.groupBy("source", "v").agg(F.count("*").alias("cs")).persist()
    gb = c0.agg(
        F.min("v").alias("mn"),
        (F.max("v") - F.min("v") + F.lit(1)).alias("span"),
    )
    # Monotone integer quantization — identical DIV arithmetic to the
    # oracle's // — caps the grid at KS_GRID_CELLS cells by
    # construction: (v - mn) <= span - 1 implies cell <= cells - 1.
    c = (
        c0.crossJoin(F.broadcast(gb))
        .select(
            "source",
            F.expr(f"((v - mn) * {KS_GRID_CELLS}) DIV span").alias("v"),
            "cs",
        )
        .groupBy("source", "v")
        .agg(F.sum("cs").alias("cs"))
        .persist()
    )
    av = c.groupBy("v").agg(F.sum("cs").alias("ca"))
    cuma = av.select(
        "v", F.sum("ca").over(Window.orderBy("v")).alias("cum_all")
    )
    srcs = c.groupBy("source").agg(F.sum("cs").alias("n_s"))
    tot = srcs.agg(F.sum("n_s").alias("n"))
    grid = srcs.crossJoin(av.select("v"))
    cums = (
        grid.join(c, ["source", "v"], "left")
        .select(
            "source",
            "n_s",
            "v",
            F.sum(F.coalesce(F.col("cs"), F.lit(0)))
            .over(Window.partitionBy("source").orderBy("v"))
            .alias("cum_s"),
        )
    )
    diff = F.abs(
        F.col("cum_s") * (F.col("n") - F.col("n_s"))
        - (F.col("cum_all") - F.col("cum_s")) * F.col("n_s")
    )
    result = (
        cums.join(cuma, "v")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.max("n_s").cast("bigint").alias("n_s"),
            F.max(diff).cast("bigint").alias("d_scaled"),
            F.max("n").alias("_n"),
        )
        .select(
            "source",
            "n_s",
            "d_scaled",
            # NULLIF guards the degenerate single-source corpus
            # (n_rest = 0): DuckDB's // 0 ERRORS while Spark's DIV 0
            # returns NULL — NULLIF makes both sides NULL.
            F.expr(
                "CAST((d_scaled * 1000000)"
                " DIV NULLIF(n_s * (_n - n_s), 0) AS BIGINT)"
            ).alias("d_ppm"),
        )
        .orderBy(F.desc("d_ppm"), "source")
    )
    return unpersist_with(unpersist_with(result, c), c0)
