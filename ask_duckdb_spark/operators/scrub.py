"""Corpus-scrubbing operators (SURVEY.md §2.9): PII redaction, URL
normalization/dedup, token-window chunking, char-diversity filtering.

The reference has no scrubbing surface (its engine runs arbitrary SQL,
reference: query_db.py:49); these are the training-data-pipeline steps
a 100 TB corpus needs before tokenization. All four are JVM-side
expression code — no Python in any path:

- redaction / normalization / diversity are narrow maps (zero shuffle);
- chunking is a narrow ``posexplode`` (zero shuffle; output rows ~2x
  token count / stride);
- URL dedup is one map-side-combinable keyed shuffle of (url, doc_id).

The synthetic ``documents`` fixture contains no organic PII or URLs, so
the PII/URL operators first ENRICH the text with spans derived
deterministically from ``doc_id`` — the identical concat runs in the
DuckDB oracle, so the redaction/normalization logic is exercised
non-vacuously and the comparison stays exact. In production the
enrichment step drops out and the scrub expressions apply unchanged.

Regex note: patterns avoid lookaround and use only syntax shared by
Java regex (Spark) and RE2 (DuckDB), and every DuckDB
``regexp_replace`` carries the ``'g'`` flag to match Spark's
replace-all default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.catalog import load_table
from .registry import query

EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"\b555-[0-9]{4}\b"
IP_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"

#: Deterministic PII spans appended to each document (SQL fragment and
#: the equivalent Spark expression must stay in lockstep).
_PII_SQL = (
    "text || ' Contact user' || CAST(doc_id AS VARCHAR)"
    " || '@example.com or call 555-01'"
    " || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')"
    " || ' at 192.168.' || CAST(doc_id % 256 AS VARCHAR)"
    " || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)"
)


def _pii_enriched() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" Contact user"),
        d.cast("string"),
        F.lit("@example.com or call 555-01"),
        F.lpad((d % 100).cast("string"), 2, "0"),
        F.lit(" at 192.168."),
        (d % 256).cast("string"),
        F.lit("."),
        ((d * 7) % 256).cast("string"),
    )


@query(
    "x45_pii_redaction",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(enriched, '{EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(enriched, '{PHONE_RE}')) AS BIGINT)
             AS n_phones,
           CAST(len(regexp_extract_all(
             regexp_replace(enriched, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{IP_RE}')) AS BIGINT) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(enriched, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
             '{IP_RE}', '<IP>', 'g') AS clean_text
    FROM (SELECT doc_id, {_PII_SQL} AS enriched FROM documents)
    ORDER BY doc_id
    """,
)
def x45_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction: scrub emails, phone numbers, and IPv4 addresses.

    Pure narrow map — three chained ``regexp_replace`` passes plus
    match counts, all whole-stage-codegen JVM expressions; at 100 TB
    this is scan-bound with zero shuffle. Emails are redacted BEFORE
    IPs are counted so a dotted-quad inside a hostname is never
    double-counted (the oracle counts in the same order).
    """
    docs = load_table(spark, sf_dir, "documents")
    enriched = _pii_enriched()
    no_email = F.regexp_replace(enriched, EMAIL_RE, "<EMAIL>")
    return (
        docs.select(
            "doc_id",
            F.regexp_count(enriched, F.lit(EMAIL_RE))
            .cast("bigint")
            .alias("n_emails"),
            F.regexp_count(enriched, F.lit(PHONE_RE))
            .cast("bigint")
            .alias("n_phones"),
            F.regexp_count(no_email, F.lit(IP_RE))
            .cast("bigint")
            .alias("n_ips"),
            F.regexp_replace(
                F.regexp_replace(no_email, PHONE_RE, "<PHONE>"),
                IP_RE,
                "<IP>",
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


URL_RE = r"https?://[^ ]+"

_URL_SQL = (
    "text || ' see https://CDN' || CAST(doc_id % 5 AS VARCHAR)"
    " || '.Example.COM/assets/item' || CAST(doc_id % 40 AS VARCHAR)"
    " || '?utm_source=feed&sid=' || CAST(doc_id AS VARCHAR)"
)


def _url_enriched() -> F.Column:
    d = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.lit(" see https://CDN"),
        (d % 5).cast("string"),
        F.lit(".Example.COM/assets/item"),
        (d % 40).cast("string"),
        F.lit("?utm_source=feed&sid="),
        d.cast("string"),
    )


@query(
    "x46_url_normalize_dedup",
    oracle=f"""
    SELECT lower(regexp_replace(url, '\\?.*$', '')) AS url_norm,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM (
      SELECT doc_id,
             unnest(regexp_extract_all({_URL_SQL}, '{URL_RE}')) AS url
      FROM documents
    )
    GROUP BY url_norm
    ORDER BY url_norm
    """,
)
def x46_url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL extraction, normalization, and duplicate counting.

    Extract every URL (``regexp_extract_all`` + ``explode`` — narrow),
    normalize (strip the query string, lowercase — the host is
    case-insensitive and the synthetic paths are case-stable), then one
    map-side-combinable shuffle on the normalized URL. 500 docs
    collapse to 200 distinct URLs, so the dedup is non-vacuous; at
    100 TB the shuffle moves (url, count) partials, not documents.
    """
    docs = load_table(spark, sf_dir, "documents")
    url = F.explode(
        F.regexp_extract_all(_url_enriched(), F.lit(URL_RE), 0)
    ).alias("url")
    return (
        docs.select("doc_id", url)
        .select(
            "doc_id",
            F.lower(F.regexp_replace("url", r"\?.*$", "")).alias("url_norm"),
        )
        .groupBy("url_norm")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("url_norm")
    )


CHUNK = 100  # tokens per training chunk
STRIDE = 50  # 50% overlap


@query(
    "x47_chunk_documents",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[ \t\n\r\x0B\f]+'),
                         t -> t <> '') AS w
      FROM documents
    )
    SELECT doc_id,
           CAST(st // {STRIDE} AS BIGINT) AS chunk_id,
           CAST(len(w[st + 1 : st + {CHUNK}]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(w[st + 1 : st + {CHUNK}], ' ') AS chunk_text
    FROM (
      SELECT doc_id, w, unnest(range(0, len(w), {STRIDE})) AS st
      FROM tok WHERE len(w) > 0
    )
    ORDER BY doc_id, chunk_id
    """,
)
def x47_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking for training-sequence packing.

    Splits each document into {CHUNK}-token chunks every {STRIDE}
    tokens (50% overlap) — the standard pre-tokenization windowing.
    ``sequence`` + ``posexplode`` + ``slice`` keep it a narrow map:
    zero shuffle, output rows ~= 2x tokens / {CHUNK}. Shares the x8
    tokenizer so chunk boundaries match the token-stats operators.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    exploded = (
        docs.select("doc_id", toks.alias("w"))
        .filter(F.size("w") > 0)
        .select(
            "doc_id",
            "w",
            F.explode(
                F.sequence(F.lit(0), F.size("w") - 1, F.lit(STRIDE))
            ).alias("st"),
        )
    )
    chunk = F.slice("w", F.col("st") + 1, F.lit(CHUNK))
    return (
        exploded.select(
            "doc_id",
            F.floor(F.col("st") / STRIDE).cast("bigint").alias("chunk_id"),
            F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
        .orderBy("doc_id", "chunk_id")
    )


_LETTERS = "abcdefghijklmnopqrstuvwxyz"
DIVERSITY_CUT = 0.92


def _diversity_sql() -> str:
    freqs = ", ".join(
        f"length(t) - length(replace(t, '{c}', '')) AS f_{c}"
        for c in _LETTERS
    )
    tot = " + ".join(f"f_{c}" for c in _LETTERS)
    terms = " + ".join(f"(f_{c} / tot) * (f_{c} / tot)" for c in _LETTERS)
    return f"""
    SELECT doc_id,
           CASE WHEN tot = 0 THEN 0.0 ELSE 1.0 - ({terms}) END AS diversity
    FROM (
      SELECT doc_id, ({tot}) AS tot, {", ".join("f_" + c for c in _LETTERS)}
      FROM (SELECT doc_id, {freqs} FROM
            (SELECT doc_id, lower(text) AS t FROM documents))
    )
    """


@query(
    "x48_char_diversity_filter",
    oracle=f"""
    SELECT doc_id,
           floor(diversity * 10000 + 0.5) / 10000 AS diversity,
           diversity < {DIVERSITY_CUT} AS is_low_quality
    FROM ({_diversity_sql()})
    ORDER BY doc_id
    """,
)
def x48_char_diversity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Letter-distribution diversity (Simpson index) quality filter.

    1 - sum(p_c^2) over the 26 letter frequencies — a repetition /
    gibberish detector that, unlike Shannon entropy, uses only +,*,/
    so the Spark and DuckDB doubles are bit-identical (no libm-vs-JVM
    transcendental ulp risk). Frequencies come from 26
    length-after-replace expressions: a narrow, codegen-friendly map
    with zero shuffle — at 100 TB this is scan-bound.
    """
    docs = load_table(spark, sf_dir, "documents")
    t = F.lower(F.col("text"))
    freqs = {
        c: (F.length(t) - F.length(F.replace(t, F.lit(c)))).alias(f"f_{c}")
        for c in _LETTERS
    }
    staged = docs.select("doc_id", *freqs.values())
    tot = None
    for c in _LETTERS:
        tot = F.col(f"f_{c}") if tot is None else tot + F.col(f"f_{c}")
    staged = staged.withColumn("tot", tot)
    terms = None
    for c in _LETTERS:
        term = (F.col(f"f_{c}") / F.col("tot")) * (
            F.col(f"f_{c}") / F.col("tot")
        )
        terms = term if terms is None else terms + term
    diversity = F.when(F.col("tot") == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) - terms
    )
    return (
        staged.withColumn("diversity", diversity)
        .select(
            "doc_id",
            # portable 4dp rounding (the q2/x20 fix pattern): ROUND
            # half-up semantics differ across engines at/near decimal
            # midpoints — found live at sf0.1 (0.88875-class values)
            (F.floor(F.col("diversity") * 10000 + 0.5) / 10000).alias(
                "diversity"
            ),
            (F.col("diversity") < DIVERSITY_CUT).alias("is_low_quality"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Incremental ingestion + corpus-maintenance operators
# ---------------------------------------------------------------------------

from .dedup import (  # noqa: E402  (shared 8-gram posting machinery)
    CAPPED_POSTINGS_CTE_SQL,
    GRAMS_CTE_SQL,
    capped_postings,
    distinct_grams,
)

NEARDUP_CUT = 0.5  # Jaccard threshold for incremental near-dup flags
DOMAIN_CAP = 10  # max docs kept per source/domain
LENGTH_PCT = 0.95  # length-outlier percentile


@query(
    "x49_incremental_dedup",
    oracle=f"""
    WITH cut AS (SELECT (max(doc_id) * 4) // 5 AS c FROM documents),
    incoming AS (
      SELECT doc_id, text FROM documents, cut WHERE doc_id >= cut.c
    ),
    corpus AS (
      SELECT doc_id, text FROM documents, cut WHERE doc_id < cut.c
    ),
    exact AS (
      SELECT DISTINCT i.doc_id FROM incoming i
      JOIN corpus co ON md5(i.text) = md5(co.text)
    ),
    {GRAMS_CTE_SQL},
    {CAPPED_POSTINGS_CTE_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM pruned GROUP BY doc_id),
    overlap AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
      FROM pruned a JOIN pruned b ON a.g = b.g, cut
      WHERE a.doc_id < cut.c AND b.doc_id >= cut.c
      GROUP BY 1, 2
    ),
    near AS (
      SELECT DISTINCT id_b AS doc_id FROM overlap
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= {NEARDUP_CUT}
    )
    SELECT i.doc_id,
           i.doc_id IN (SELECT doc_id FROM exact) AS is_exact_dup,
           i.doc_id IN (SELECT doc_id FROM near) AS is_near_dup,
           i.doc_id NOT IN (SELECT doc_id FROM exact)
             AND i.doc_id NOT IN (SELECT doc_id FROM near) AS kept
    FROM incoming i
    ORDER BY i.doc_id
    """,
)
def x49_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingestion dedup: flag a new batch against the corpus.

    The streaming-adjacent shape every growing corpus needs: the newest
    20% of documents (by id — stand-in for an arrival batch) are checked
    against the existing 80% for (a) exact duplicates via content hash
    and (b) near-duplicates via the x3 inverted-index 8-gram Jaccard,
    restricted to CROSS-boundary pairs only — the join never pairs two
    corpus docs, so incremental cost is O(batch x colliding grams), not
    O(corpus^2). Posting lists carry the same least(n/4, MAX_POSTING)
    skew cap as x3. The fixture has no cross-boundary exact dups (the
    flag column is exercised by the oracle comparison either way); the
    near-dup flag fires on 7 of 101 incoming docs at sf0.01.
    """
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.agg(F.expr("(max(doc_id) * 4) div 5").alias("c"))
    # ONE broadcast of the boundary scalar: every downstream frame
    # (incoming/corpus split, both overlap sides) derives from this
    # tagged frame instead of re-joining cut per consumer
    tagged = docs.join(F.broadcast(cut)).withColumn(
        "is_incoming", F.col("doc_id") >= F.col("c")
    )
    incoming = tagged.filter("is_incoming").select("doc_id", "text")
    corpus = tagged.filter(~F.col("is_incoming")).select("doc_id", "text")
    exact = (
        incoming.alias("i")
        .join(
            corpus.alias("co"),
            F.md5(F.col("i.text")) == F.md5(F.col("co.text")),
            "left_semi",
        )
        .select(F.col("doc_id").alias("exact_id"))
        .distinct()
    )
    # tag the pruned posting lists with ONE broadcast of the boundary
    # scalar; the corpus/incoming split of the join sides is then a
    # filter over the same frame, not two more joins
    pruned = (
        capped_postings(distinct_grams(docs), docs)
        .join(F.broadcast(cut))
        .withColumn("is_incoming", F.col("doc_id") >= F.col("c"))
    )
    sizes = pruned.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = pruned.filter(~F.col("is_incoming")).select(
        F.col("doc_id").alias("id_a"), "g"
    )
    b = pruned.filter("is_incoming").select(
        F.col("doc_id").alias("id_b"), "g"
    )
    overlap = a.join(b, "g").groupBy("id_a", "id_b").agg(
        F.count("*").alias("cnt")
    )
    near = (
        overlap.join(
            sizes.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb")),
            "id_b",
        )
        .filter(
            F.col("cnt").cast("double")
            / (F.col("na") + F.col("nb") - F.col("cnt"))
            >= NEARDUP_CUT
        )
        .select(F.col("id_b").alias("near_id"))
        .distinct()
    )
    return (
        incoming.join(
            F.broadcast(exact.withColumn("_e", F.lit(True))),
            incoming.doc_id == F.col("exact_id"),
            "left",
        )
        .join(
            F.broadcast(near.withColumn("_n", F.lit(True))),
            incoming.doc_id == F.col("near_id"),
            "left",
        )
        .select(
            "doc_id",
            F.coalesce(F.col("_e"), F.lit(False)).alias("is_exact_dup"),
            F.coalesce(F.col("_n"), F.lit(False)).alias("is_near_dup"),
            (
                F.coalesce(F.col("_e"), F.lit(False))
                | F.coalesce(F.col("_n"), F.lit(False))
            ).__invert__().alias("kept"),
        )
        .orderBy("doc_id")
    )


@query(
    "x50_length_outlier_filter",
    oracle=f"""
    SELECT d.doc_id, d.n_chars,
           floor((SELECT quantile_cont(n_chars, {LENGTH_PCT})
                  FROM documents) * 10000.0 + 0.5) / 10000.0 AS p95_cutoff
    FROM documents d
    WHERE d.n_chars > (SELECT quantile_cont(n_chars, {LENGTH_PCT})
                       FROM documents)
    ORDER BY d.doc_id
    """,
)
def x50_length_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-outlier detection: documents above the exact p95 length.

    Exact (not approximate) percentile so the cutoff is engine-portable:
    Spark's ``percentile`` and DuckDB's ``quantile_cont`` both use the
    linear-interpolation (type-7) definition over integer lengths. The
    percentile is one agg -> one-row broadcast; the filter is a narrow
    map. At 100 TB swap ``percentile`` for ``approx_percentile`` and
    accept the documented error band (the plan is unchanged) — exact
    percentile of one bigint column is a single-shuffle agg either way.
    """
    docs = load_table(spark, sf_dir, "documents")
    cutoff = docs.agg(
        F.percentile("n_chars", LENGTH_PCT).alias("cut")
    )
    return (
        docs.join(F.broadcast(cutoff))
        .filter(F.col("n_chars") > F.col("cut"))
        .select(
            "doc_id",
            "n_chars",
            (
                F.floor(F.col("cut") * F.lit(10000.0) + F.lit(0.5))
                / F.lit(10000.0)
            ).alias("p95_cutoff"),
        )
        .orderBy("doc_id")
    )


@query(
    "x51_domain_cap",
    oracle=f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN rn <= {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN rn > {DOMAIN_CAP} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped
    FROM (
      SELECT source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents
    )
    GROUP BY source
    ORDER BY source
    """,
)
def x51_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the C4/RefinedWeb-style domain limiter).

    Keep the first DOMAIN_CAP docs per source (deterministic: ordered
    by doc_id) and report kept/dropped counts per domain. One shuffle
    on source shared by the window AND the aggregation — the window's
    partitioning is reused by the groupBy, so adding the report costs
    no extra exchange. At 100 TB the skew risk is a mega-domain; the
    window never needs the whole partition in memory (row_number
    streams), and the cap bounds what survives.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy("doc_id")
    kept = F.col("rn") <= DOMAIN_CAP
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(kept, 1).otherwise(0)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, 0).otherwise(1))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .orderBy("source")
    )


@query(
    "x56_join_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_rows,
           floor(CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS avg_rows,
           floor(CAST(max(cnt) AS DOUBLE) * CAST(count(*) AS DOUBLE)
                 / CAST(sum(cnt) AS DOUBLE) * 10000.0 + 0.5) / 10000.0
             AS skew_factor,
           floor(CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE)
                 * 1000000.0 + 0.5) / 1000000.0 AS top_key_share
    FROM per_key
    """,
)
def x56_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew diagnostic for a prospective shuffle key.

    The report an operator runs BEFORE shuffling 100 TB on a key:
    distinct keys, max/avg rows per key, the max/avg skew factor
    (straggler-task multiplier under hash partitioning), and the
    hottest key's share of all rows. One combinable count shuffle plus
    a one-row rollup — cost is O(distinct keys), never a second scan.
    Feeds the choice between a plain shuffle, AQE skew splitting, and
    the x26/j10 salting patterns.
    """
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    # All stats derive from exact integer (sum, count, max) — the
    # closing scalar sequences mirror the oracle op-for-op, so the hash
    # is bit-portable (avg/ROUND paths differ between engines).
    s, n, mx = (
        F.sum("cnt").cast("double"),
        F.count("*").cast("double"),
        F.max("cnt").cast("double"),
    )

    def fr(c, p):
        return F.floor(c * F.lit(p) + F.lit(0.5)) / F.lit(p)

    return per_key.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("cnt").cast("bigint").alias("max_rows"),
        fr(s / n, 10000.0).alias("avg_rows"),
        fr(mx * n / s, 10000.0).alias("skew_factor"),
        fr(mx / s, 1000000.0).alias("top_key_share"),
    )
