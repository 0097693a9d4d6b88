"""Sink/source roundtrips: parquet (partitioned), CSV, JSON lines."""

from __future__ import annotations

import os

from ask_duckdb_spark.sources.catalog import load_table
from ask_duckdb_spark.sources.sinks import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_parquet,
)
from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "lang", "n_chars")


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    path = str(tmp_path / "docs_parquet")
    src = _docs(spark)
    write_parquet(src, path, partition_by=["lang"])
    # partition directories exist -> pruning-capable layout
    assert any(d.startswith("lang=") for d in os.listdir(path))
    back = spark.read.parquet(path)
    assert back.count() == src.count()
    assert {r.doc_id for r in back.filter("lang = 'en'").collect()} == {
        r.doc_id for r in src.filter("lang = 'en'").collect()
    }


def test_parquet_partition_pruning_on_reread(spark, tmp_path):
    from ask_duckdb_spark.plans.checks import formatted_plan

    path = str(tmp_path / "docs_pruned")
    write_parquet(_docs(spark), path, partition_by=["lang"])
    df = spark.read.parquet(path).filter("lang = 'en'")
    assert "PartitionFilters: [isnotnull(lang" in formatted_plan(df)


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    path = str(tmp_path / "docs_csv")
    src = _docs(spark)
    write_csv(src, path)
    back = read_csv(spark, path, "doc_id bigint, lang string, n_chars bigint")
    assert back.schema == src.schema
    assert back.count() == src.count()


def test_shard_layout_write_and_prune(spark, tmp_path):
    """x30's shard assignment written as the physical layout: partition
    by (lang, shard_no), then prove a shard read prunes partitions."""
    from ask_duckdb_spark.operators import QUERIES
    from ask_duckdb_spark.plans.checks import formatted_plan

    path = str(tmp_path / "shards")
    shards = QUERIES["x30_pack_shards"](spark, SF_DIR)
    write_parquet(shards, path, partition_by=["lang", "shard_no"])
    one = spark.read.parquet(path).filter("lang = 'en' AND shard_no = 0")
    plan = formatted_plan(one)
    assert "PartitionFilters: [isnotnull(lang" in plan
    assert one.count() > 0


def test_orc_roundtrip(spark, tmp_path):
    """ORC is the other columnar interchange format Spark ships."""
    path = str(tmp_path / "docs_orc")
    src = _docs(spark)
    src.write.orc(path)
    back = spark.read.orc(path)
    assert back.schema == src.schema and back.count() == src.count()


def test_jsonl_roundtrip(spark, tmp_path):
    path = str(tmp_path / "docs_jsonl")
    src = _docs(spark)
    write_jsonl(src, path)
    back = read_jsonl(spark, path, "doc_id bigint, lang string, n_chars bigint")
    assert sorted(r.doc_id for r in back.collect()) == sorted(
        r.doc_id for r in src.collect()
    )


def test_csv_permissive_quarantines_bad_rows(spark, tmp_path):
    from ask_duckdb_spark.sources.sinks import read_csv_permissive

    p = tmp_path / "dirty.csv"
    p.write_text(
        "id,score\n"
        "1,10.5\n"
        "oops,not_a_number\n"
        "2,20.0\n"
    )
    df = read_csv_permissive(spark, str(p), "id INT, score DOUBLE")
    # caching pins the corrupt-record column (Spark requires the raw
    # record to still exist when the filter is evaluated)
    df = df.cache()
    good = df.filter(df._corrupt_record.isNull()).drop("_corrupt_record")
    bad = df.filter(df._corrupt_record.isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "oops" in bad.collect()[0]._corrupt_record
    df.unpersist()
