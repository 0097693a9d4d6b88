"""r13 interleaved old-vs-new A/B, single session.

Rebuilds the pre-r13 ("old") plan shapes inline and times them
interleaved with the registered ("new") plans — same session, same
cache state discipline, min-of-N — so host noise hits both sides.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ask_duckdb_spark.functions.text import tokens  # noqa: E402
from ask_duckdb_spark.operators import QUERIES  # noqa: E402
from ask_duckdb_spark.operators._util import (  # noqa: E402
    money,
    rev_units,
    widen,
)
from ask_duckdb_spark.operators.dedup import (  # noqa: E402
    _jaccard_filtered,
    lsh_candidate_pairs,
    minhash_signatures,
)
from ask_duckdb_spark.operators.hygiene import EVAL_MOD, _doc_grams  # noqa: E402
from ask_duckdb_spark.operators.multimodal import (  # noqa: E402
    DECODE_SCHEMA,
    _decode_batches,
)
from ask_duckdb_spark.session import get_spark  # noqa: E402
from ask_duckdb_spark.sources.catalog import load_table  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def old_q3(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp_ntz"))
        .join(li, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp_ntz"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(money(F.sum(rev_units()), 10_000).alias("revenue"))
        .select(
            "l_orderkey", "revenue",
            F.col("o_orderdate").cast("date").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(20)
    )


def old_q5(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    asia = (
        n.join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
               n.n_regionkey == r.r_regionkey)
        .select("n_nationkey", "n_name")
    )
    s_asia = s.join(F.broadcast(asia), s.s_nationkey == asia.n_nationkey)
    return (
        li.join(s_asia, li.l_suppkey == s_asia.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, (o.o_custkey == c.c_custkey)
              & (c.c_nationkey == s_asia.s_nationkey))
        .groupBy("n_name")
        .agg(money(F.sum(rev_units()), 10_000).alias("revenue"))
    )


def old_q10(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.filter(F.col("l_returnflag") == "R"),
              li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(money(F.sum(rev_units()), 10_000).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


def old_x2(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    sig = minhash_signatures(d, "doc_id", "text").persist()
    return _jaccard_filtered(lsh_candidate_pairs(sig, "doc_id"))


def old_x22(spark, sf_dir):
    from ask_duckdb_spark.operators.textstats import floor_round

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    scored = tf.join(df, "tok").join(F.broadcast(n)).select(
        "doc_id", "tok",
        floor_round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    best = scored.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("tfidf")).alias("neg"),
                F.col("tok").alias("tok"),
                F.col("tfidf").alias("tfidf"),
            )
        ).alias("b")
    )
    return best.select(
        "doc_id", F.col("b.tok").alias("top_term"), F.col("b.tfidf").alias("tfidf")
    )


def old_x125(spark, sf_dir):
    import re as _re

    from ask_duckdb_spark.operators.stats_audit import PHRASE, _phrase_count

    d = load_table(spark, sf_dir, "documents")
    pre = r"[ \t\n\r\x0B\f]+".join(_re.escape(w) for w in PHRASE)
    cand = d.filter(F.lower(F.col("text")).rlike(pre))
    t = cand.select("doc_id", tokens(F.col("text")).alias("t"))
    hits = t.select(
        "doc_id", _phrase_count(F.col("t"), PHRASE).alias("n_occurrences")
    )
    return hits.filter(F.col("n_occurrences") > 0).orderBy(
        F.desc("n_occurrences"), "doc_id"
    )


def old_x20(spark, sf_dir):
    d = widen(load_table(spark, sf_dir, "documents"))
    payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payload.mapInPandas(_decode_batches, DECODE_SCHEMA).orderBy("doc_id")


def old_x136(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ev = _doc_grams(d.filter(F.col("doc_id") % EVAL_MOD == 0)).select(
        F.col("doc_id").alias("eval_id"), "h"
    )
    tr = (
        _doc_grams(d.filter(F.col("doc_id") % EVAL_MOD != 0))
        .select(F.col("doc_id").alias("train_id"), "h")
        .distinct()
    )
    return (
        ev.join(tr, "h")
        .groupBy("eval_id")
        .agg(
            F.countDistinct("train_id").cast("bigint").alias("n_train_docs"),
            F.countDistinct("h").cast("bigint").alias("n_leaked_grams"),
        )
        .orderBy(F.desc("n_train_docs"), "eval_id")
    )


OLD = {
    "q3_shipping_priority": old_q3,
    "q5_local_supplier_volume": old_q5,
    "q10_returned_items": old_q10,
    "x2_minhash_neardup": old_x2,
    "x22_tfidf_top_term": old_x22,
    "x125_phrase_match": old_x125,
    "x20_decode_features": old_x20,
    "x136_eval_leak_report": old_x136,
}


def main() -> int:
    names = sys.argv[1:] or sorted(OLD)
    spark = get_spark("r13_ab")
    sc = spark.sparkContext
    QUERIES["g1_count_star"](spark, SF).count()
    import pandas as _pd  # noqa: F401

    def _ident(batches):
        yield from batches

    n = sc.defaultParallelism
    spark.range(0, n, 1, n).mapInPandas(_ident, "id long").count()
    warm = "/root/testdata/sf0.01"
    plans = {}
    for name in names:
        plans[name] = {
            "old": OLD[name](spark, SF),
            "new": QUERIES[name](spark, SF),
        }
        for _ in range(2):
            OLD[name](spark, warm).count()
            QUERIES[name](spark, warm).count()
            spark.catalog.clearCache()
    REPS = 7
    res = {name: {"old": [], "new": []} for name in names}
    for rep in range(REPS):
        for name in names:
            for v in ("old", "new"):
                t0 = time.time()
                plans[name][v].count()
                res[name][v].append(time.time() - t0)
                spark.catalog.clearCache()
    print(f"load {os.getloadavg()[0]:.2f}")
    for name in names:
        o = min(res[name]["old"])
        nw = min(res[name]["new"])
        print(
            f"{name:38s} old {o:6.3f}  new {nw:6.3f}  "
            f"delta {nw - o:+6.3f} ({(nw / o - 1) * 100:+5.1f}%)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
