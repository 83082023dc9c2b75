"""iceberg_meta.export_table: DataFrame -> single-snapshot Iceberg v2
table, readback-gated through the repo's own native reader."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.sources import iceberg_meta


def test_export_roundtrips_through_native_reader(spark, tmp_path):
    df = (spark.range(0, 500)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("s"), (F.col("id") % 5).cast("string"))
                  .alias("source"),
                  (F.col("id") * 3).alias("n_chars"),
                  F.array(F.col("id").cast("int"),
                          (F.col("id") + 1).cast("int")).alias("toks"))
          .repartition(3))
    out = str(tmp_path / "tbl")
    res = iceberg_meta.export_table(df, out)
    assert res["n_rows"] == 500 and len(res["files"]) == 3

    # the native reader resolves the snapshot and Spark reads it back
    files = iceberg_meta.snapshot_data_files(out)
    back = spark.read.parquet(*files)
    assert back.count() == 500
    got = sorted(r.doc_id for r in back.select("doc_id").collect())
    assert got == list(range(500))
    arr = back.filter(F.col("doc_id") == 7).collect()[0]
    assert list(arr.toks) == [7, 8]


def test_export_schema_has_unique_nested_field_ids(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1, 2], {"k": 1.5}, (10, "x"))],
        "a long, arr array<int>, m map<string,double>, "
        "s struct<u:long, v:string>")
    out = str(tmp_path / "tbl2")
    iceberg_meta.export_table(df, out)
    meta = json.loads((tmp_path / "tbl2" / "metadata" /
                       "v1.metadata.json").read_text())
    schema = meta["schemas"][0]
    ids = []

    def walk(t):
        if isinstance(t, dict):
            if t["type"] == "struct":
                for f in t["fields"]:
                    ids.append(f["id"])
                    walk(f["type"])
            elif t["type"] == "list":
                ids.append(t["element-id"])
                walk(t["element"])
            elif t["type"] == "map":
                ids.append(t["key-id"])
                ids.append(t["value-id"])
                walk(t["key"])
                walk(t["value"])

    walk(schema)
    assert len(ids) == len(set(ids)), ids
    # top-level 1..4, nested allocated after
    top = [f["id"] for f in schema["fields"]]
    assert top == [1, 2, 3, 4]
    assert min(i for i in ids if i not in top) > 4
    # spot-check primitive mappings
    by_name = {f["name"]: f["type"] for f in schema["fields"]}
    assert by_name["a"] == "long"
    assert by_name["arr"]["element"] == "int"
    assert by_name["m"]["value"] == "double"


def test_export_refuses_unmappable_types_and_remote(spark, tmp_path):
    df = spark.createDataFrame([(bytearray(b"x"),)], "b binary") \
        .select(F.col("b"), F.lit(None).cast("void").alias("n"))
    with pytest.raises(NotImplementedError, match="Iceberg mapping"):
        iceberg_meta.export_table(df, str(tmp_path / "bad"))
    ok = spark.createDataFrame([(1,)], "a long")
    with pytest.raises(NotImplementedError, match="local"):
        iceberg_meta.export_table(ok, "mock-s3://bucket/t")


def test_export_feeds_encode_path(spark, tmp_path):
    from embulk_input_parquet_hadoop_spark.plans import pipeline
    from embulk_input_parquet_hadoop_spark.sources.datagen import generate
    src = tmp_path / "src"
    generate(str(src), n_docs=400, seed=13, n_files=1)
    tok = spark.read.parquet(str(src))
    out = str(tmp_path / "iceberg_tbl")
    iceberg_meta.export_table(tok, out)
    enc = str(tmp_path / "enc")
    files = iceberg_meta.snapshot_data_files(out)
    t = pipeline.encode_path(spark, out, enc, input_files=files)
    assert t["n_rows"] == 400
    from embulk_input_parquet_hadoop_spark.plans import verify
    assert verify.verify_files(spark, enc)["ok"]


def test_export_metadata_is_spec_complete(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, [1, 2], "x")],
        "a long, arr array<int>, s string") \
        .select(F.col("a"), F.col("arr"),
                F.col("s").cast("string").alias("s"))
    out = str(tmp_path / "tbl3")
    iceberg_meta.export_table(df, out)
    meta = json.loads((tmp_path / "tbl3" / "metadata" /
                       "v1.metadata.json").read_text())
    # spec-required v2 top-level fields readers reject without
    for k in ("last-sequence-number", "last-updated-ms",
              "last-column-id", "default-spec-id", "last-partition-id",
              "default-sort-order-id"):
        assert k in meta, k
    assert meta["partition-specs"] == [{"spec-id": 0, "fields": []}]
    assert meta["sort-orders"] == [{"order-id": 0, "fields": []}]
    # last-column-id covers the nested element id too
    assert meta["last-column-id"] == 4
    # name mapping lets readers resolve the id-less data parquet
    nm = json.loads(meta["properties"]["schema.name-mapping.default"])
    assert [e["names"] for e in nm] == [["a"], ["arr"], ["s"]]
    arr_entry = nm[1]
    assert arr_entry["fields"][0]["names"] == ["element"]
    assert arr_entry["fields"][0]["field-id"] == 4


def test_export_preserves_top_level_nullability(spark, tmp_path):
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)
    schema = StructType([StructField("a", LongType(), False),
                         StructField("b", StringType(), True)])
    df = spark.createDataFrame([(1, "x")], schema)
    out = str(tmp_path / "tbl4")
    iceberg_meta.export_table(df, out)
    meta = json.loads((tmp_path / "tbl4" / "metadata" /
                       "v1.metadata.json").read_text())
    req = {f["name"]: f["required"]
           for f in meta["schemas"][0]["fields"]}
    assert req == {"a": True, "b": False}


def test_export_parses_through_full_snapshot_scan(spark, tmp_path):
    # encode_job --iceberg plans via snapshot_scan (the delete-aware
    # path) — the exported manifests must parse through it, not only
    # through snapshot_data_files
    df = spark.range(0, 50).select(F.col("id").alias("a"))
    out = str(tmp_path / "tbl5")
    res = iceberg_meta.export_table(df, out)
    scan = iceberg_meta.snapshot_scan(out)
    assert sorted(scan["data_files"]) == sorted(res["files"])
    assert not scan["position_deletes"]
    assert not scan.get("eq_deletes")
