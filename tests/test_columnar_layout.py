"""Per-column re-layout: partition-pruned single-column reads.

The SCALE.md 'known IO trade' made concrete: after relayout_columnar,
reading one column scans only its Hive partition — verified both by the
decoded values matching the source and by the scan's partition filter /
on-disk byte split.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.plans import columnar, pipeline


@pytest.fixture(scope="module")
def laid_out(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("colmod")
    tok, out, col = (str(base / d) for d in ("tokens", "enc", "cols"))
    rows = [(f"d{i}", list(range(i % 40 + 1)), i % 40 + 1, f"s{i % 4}")
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    df.repartition(4).write.parquet(tok)
    pipeline.encode_path(spark, tok, out, waves=2)
    totals = columnar.relayout_columnar(spark, out, col)
    return df, col, totals


def test_column_values_roundtrip(spark, laid_out):
    df, col, _ = laid_out
    n_tok = columnar.read_column(spark, col, "n_tok", "int")
    got = sorted(r["n_tok"] for r in n_tok.collect())
    want = sorted(r["n_tok"] for r in df.collect())
    assert got == want
    toks = columnar.read_column(spark, col, "tokens", "array<int>")
    assert (toks.select(F.sum(F.size("tokens"))).first()[0]
            == sum(want))


def test_partition_pruning_and_byte_split(spark, laid_out):
    df, col, totals = laid_out
    # the scan's partition filter proves only name=n_tok is read
    plan = columnar.read_column(spark, col, "n_tok", "int") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "name" in plan and "n_tok" in plan, plan
    # the IO win is real: the tokens partition holds the overwhelming
    # share of the payload bytes, and a n_tok read touches none of it.
    # (on-disk file sizes are compared only directionally here: at this
    # toy scale parquet per-file framing ~3.5KB dominates both sides)
    assert set(totals) == {"doc_id", "tokens", "n_tok", "source"}
    assert totals["n_tok"]["enc_bytes"] * 5 < totals["tokens"]["enc_bytes"]
    nt = sum(os.path.getsize(p) for p in
             glob.glob(f"{col}/name=n_tok/*.parquet"))
    tk = sum(os.path.getsize(p) for p in
             glob.glob(f"{col}/name=tokens/*.parquet"))
    assert 0 < nt < tk


def test_zone_map_pruned_column_read(spark, laid_out):
    df, col, _ = laid_out
    sel = columnar.read_column(spark, col, "n_tok", "int",
                               vmin=35, vmax=40)
    got = sorted(r["n_tok"] for r in sel.collect())
    want = sorted(r["n_tok"] for r in df.collect()
                  if 35 <= r["n_tok"] <= 40)
    assert got == want


def test_multi_column_row_alignment(spark, laid_out):
    df, col, _ = laid_out
    two = columnar.read_columns(
        spark, col, {"doc_id": "string", "n_tok": "int"})
    got = {r["doc_id"]: r["n_tok"] for r in two.collect()}
    want = {r["doc_id"]: r["n_tok"] for r in df.collect()}
    assert got == want  # every row re-paired with ITS value, none crossed
    three = columnar.read_columns(
        spark, col, {"doc_id": "string", "tokens": "array<int>",
                     "source": "string"})
    row = three.filter(F.col("doc_id") == "d37").first()
    assert row["tokens"] == list(range(38)) and row["source"] == "s1"
    with pytest.raises(ValueError):
        columnar.read_columns(spark, col, {})


def test_relayout_excludes_uncommitted_waves(spark, tmp_path):
    import shutil
    tok, out, col = (str(tmp_path / d) for d in ("t", "e", "c"))
    rows = [(f"d{i}", [i, i + 1], 2, "s") for i in range(100)]
    spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    ).repartition(2).write.parquet(tok)
    pipeline.encode_path(spark, tok, out, waves=2)
    # simulate a torn wave: data present, manifest record gone
    os.remove(os.path.join(out, "manifest", "wave-1.json"))
    totals = columnar.relayout_columnar(spark, out, col)
    vals = columnar.read_column(spark, col, "n_tok", "int")
    committed = pipeline.read_chunks(spark, out)
    n_committed = committed.agg(F.sum("n_rows")).first()[0]
    assert vals.count() == n_committed < 100
    assert totals["n_tok"]["n_chunks"] == committed.count()
    shutil.rmtree(col)


def test_relayout_empty_tree_returns_empty(spark, tmp_path):
    tok, out, col = (str(tmp_path / d) for d in ("t", "e", "c"))
    spark.createDataFrame(
        [("d0", [1], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string"
    ).write.parquet(tok)
    pipeline.encode_path(spark, tok, out)
    os.remove(os.path.join(out, "manifest", "wave-0.json"))
    assert columnar.relayout_columnar(spark, out, col) == {}


def test_read_columns_mixed_schema_union_nulls(spark, tmp_path):
    # chunks missing a requested column still contribute rows (null for
    # the absent column) — read_decoded's union-with-nulls semantics
    tok, out, col = (str(tmp_path / d) for d in ("t", "e", "c"))
    spark.createDataFrame([("a1", 10)], "doc_id string, n_chars bigint") \
        .write.parquet(f"{tok}/p1")
    spark.createDataFrame([("b1", "web")], "doc_id string, source string") \
        .write.parquet(f"{tok}/p2")
    pipeline.encode_path(spark, tok, out, schema_mode="mixed")
    columnar.relayout_columnar(spark, out, col)
    rows = {r["doc_id"]: (r["n_chars"], r["source"])
            for r in columnar.read_columns(
                spark, col, {"doc_id": "string", "n_chars": "bigint",
                             "source": "string"}).collect()}
    assert rows == {"a1": (10, None), "b1": (None, "web")}
    with pytest.raises(ValueError):
        columnar.read_columns(spark, col, {"__ord": "bigint"})
