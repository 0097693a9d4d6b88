"""Dictionary layer: load/write, synonym map, skeleton generation."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from ask_duckdb_spark.nl.dictionary import (
    build_synonym_map,
    load_dictionary,
    make_skeleton,
    write_dictionary,
)


def test_synonym_map_lowercases_aliases():
    meta = {
        "columns": [
            {"name": "status", "aliases": ["State", "STATE ALIAS"]},
            {"name": "queue", "aliases": ["name"]},
            {"name": "broken", "aliases": [None, ""]},
            {"aliases": ["orphan"]},
        ]
    }
    m = build_synonym_map(meta)
    assert m == {"state": "status", "state alias": "status", "name": "queue"}


def test_synonym_map_empty_meta():
    assert build_synonym_map(None) == {}
    assert build_synonym_map({}) == {}


def test_skeleton_shape_and_hints():
    schema = T.StructType(
        [
            T.StructField("queue", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("s", T.StructType([T.StructField("f", T.IntegerType())])),
            T.StructField("m", T.MapType(T.StringType(), T.StringType())),
        ]
    )
    sk = make_skeleton("queuedata", schema)
    assert sk["table"] == "queuedata"
    assert sk["rules"] == []
    cols = {c["name"]: c for c in sk["columns"]}
    assert cols["queue"]["type"] == "STRING"
    assert cols["n"]["type"] == "BIGINT"
    assert cols["queue"]["importance"] == 5
    assert cols["queue"]["canonicalization"] == {"case": "none", "map_values": {}}
    # complex types get spark_access hints; scalars get none
    assert cols["s"]["spark_access"] == {"example": "s.field"}
    assert cols["m"]["spark_access"] == {"example": "m['key']"}
    assert "spark_access" not in cols["queue"]


def test_roundtrip(tmp_path):
    path = str(tmp_path / "dict.json")
    data = {"version": "1.0", "columns": [{"name": "a"}]}
    write_dictionary(path, data)
    assert load_dictionary(path) == data
    # human-readable formatting (indent=2), like the reference writer
    assert "\n  " in open(path).read()


def test_reference_shaped_dictionary_loads(tmp_path):
    """A dictionary with duckdb_access (reference-generated) works."""
    from ask_duckdb_spark.nl.dictionary import access_hints

    col = {"name": "c", "duckdb_access": {"example": "json_extract(c, '$.k')"}}
    assert access_hints(col)["example"] == "json_extract(c, '$.k')"
    both = {
        "name": "c",
        "spark_access": {"example": "spark"},
        "duckdb_access": {"example": "duck"},
    }
    assert access_hints(both)["example"] == "spark"  # spark_access wins


def test_skeleton_json_serializable(tmp_path):
    schema = T.StructType([T.StructField("a", T.StringType())])
    json.dumps(make_skeleton("t", schema))
