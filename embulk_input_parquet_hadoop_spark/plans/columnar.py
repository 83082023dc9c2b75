"""Opt-in per-column re-layout of committed chunk trees.

The row chunk layout stores every column's payload in one ``blobs`` list
per chunk row, so a column-projected decode skips the *decode* of unread
columns but still reads their bytes (SCALE.md "known IO trade"). This
module makes the documented alternative concrete WITHOUT touching the
encode pipeline: a one-pass re-layout job explodes committed chunks into
one row per (chunk, column) and writes them ``partitionBy(name)`` — a
Hive-partitioned directory per column — so a single-column read is
partition-pruned to exactly that column's bytes at the Parquet scan, the
column-store property. Zone-map stats (vmin/vmax) ride along, so chunk
pruning composes with the partition pruning.

Scale shape: the re-layout is one distributed pass over the chunk rows
(map + a partitioned write — the write shuffles by the partition column,
|columns| keys; payload bytes cross the cluster once). Reads are
embarrassingly parallel scans of one directory.

Scope: ``read_column`` serves single-column analytic reads (scan the
tokens column, aggregate n_tok, ...) — the workload the IO trade hurts.
``read_columns`` reassembles a FEW columns row-aligned via a join on
(chunk_id, intra-chunk ordinal); when most of the row is read anyway,
the row layout's ``read_decoded`` is the better plan — the re-layout is
an *additional* view, not a replacement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.encode import decode_column
from .pipeline import read_chunks


def relayout_columnar(spark: SparkSession, out_dir: str,
                      col_dir: str) -> dict:
    """Explode a committed chunk tree into a per-column layout under
    ``col_dir`` (Hive-partitioned by column name). Returns totals (empty
    dict when the tree has no committed waves — an empty partitioned
    write leaves nothing `spark.read.parquet` can infer a schema from,
    so the no-op case returns early instead of crashing the reader)."""
    chunks = read_chunks(spark, out_dir)
    if not chunks.take(1):
        return {}
    z = F.explode(F.arrays_zip("cols", "blobs")).alias("z")
    per = (chunks
           .select("chunk_id", "wave_id", "part_id", "batch_idx",
                   "n_rows", z)
           .select("chunk_id", "wave_id", "part_id", "batch_idx",
                   "n_rows",
                   F.col("z.cols.name").alias("name"),
                   F.col("z.cols.kind").alias("kind"),
                   F.col("z.cols.n_values").alias("n_values"),
                   F.col("z.cols.enc_bytes").alias("enc_bytes"),
                   F.col("z.cols.vmin").alias("vmin"),
                   F.col("z.cols.vmax").alias("vmax"),
                   F.col("z.blobs").alias("blob")))
    (per.write.mode("overwrite")
        .option("compression", "uncompressed")  # payloads are framed
        .partitionBy("name").parquet(col_dir))
    out = spark.read.parquet(col_dir)
    agg = out.groupBy("name").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("enc_bytes").alias("enc_bytes")).collect()
    return {r["name"]: {"n_chunks": r["n_chunks"],
                        "enc_bytes": int(r["enc_bytes"])} for r in agg}


def read_column(spark: SparkSession, col_dir: str, name: str,
                spark_type: str,
                vmin: int | None = None,
                vmax: int | None = None) -> DataFrame:
    """Decode ONE column from the per-column layout.

    The ``name`` filter is a partition filter — Spark's scan lists and
    reads only ``{col_dir}/name={name}/`` — and the optional
    [vmin, vmax] range applies zone-map chunk pruning *before* any
    payload decode (then again as an exact row filter after, same
    contract as ``read_decoded``). Row order follows chunk order within
    each scan task; single-column analytic consumers (aggregates,
    histograms, filters) are order-free by construction.
    """
    rows = spark.read.parquet(col_dir).filter(F.col("name") == name)
    if vmin is not None:
        rows = rows.filter(F.col("vmax").isNull() |
                           (F.col("vmax") >= vmin))
    if vmax is not None:
        rows = rows.filter(F.col("vmin").isNull() |
                           (F.col("vmin") <= vmax))
    rows = rows.select("kind", "blob")
    struct = spark.createDataFrame([], f"`{name}` {spark_type}").schema
    from pyspark.sql.pandas.types import to_arrow_schema
    target = to_arrow_schema(struct).field(0).type

    def dec(batches):
        for b in batches:
            if b.num_rows == 0:
                continue
            kinds = b.column("kind").to_pylist()
            blobs = b.column("blob")
            arrs = []
            for i, kind in enumerate(kinds):
                arr = decode_column(kind, blobs[i].as_buffer())
                if arr.type != target:
                    arr = arr.cast(target)
                arrs.append(arr)
            yield pa.RecordBatch.from_arrays(
                [pa.concat_arrays(arrs)], names=[name])

    out = rows.mapInArrow(dec, f"`{name}` {spark_type}")
    # exact residual row filter: scalar integer columns only — for
    # list<int32> the zone stats are ELEMENT min/max (chunk pruning above
    # is still valid; a row filter on the array column would not be)
    if struct.fields[0].dataType.simpleString() in (
            "tinyint", "smallint", "int", "bigint"):
        if vmin is not None:
            out = out.filter(F.col(name) >= vmin)
        if vmax is not None:
            out = out.filter(F.col(name) <= vmax)
    return out


def read_columns(spark: SparkSession, col_dir: str,
                 columns: dict[str, str]) -> DataFrame:
    """Row-aligned multi-column read from the per-column layout.

    ``columns`` maps column name -> Spark type DDL. Each column decodes
    independently from its own partition (same pruned scans as
    ``read_column``) into (key, ordinal, value) rows — the ordinal is
    the value's position inside its chunk, which IS the row identity the
    per-column files share — then the columns FULL-OUTER join on the
    key. Mixed-schema trees therefore keep ``read_decoded``'s
    union-with-nulls semantics: a chunk missing one requested column
    still contributes its rows, with that column null. (The one corner
    that differs: a chunk containing NONE of the requested columns has
    no decodable ordinals here and contributes nothing, where
    ``read_decoded`` would emit all-null rows for it.) One shuffle per
    column; the row-layout ``read_decoded`` stays the better plan when
    most of the row is read anyway, and this path wins when a few
    narrow columns are read from a wide table (the join keys are small
    and the wide payloads were never scanned).
    """
    if not columns:
        raise ValueError("columns must be non-empty")
    reserved = {"__cid", "__ord"} & set(columns)
    if reserved:
        raise ValueError(f"column names {sorted(reserved)} are reserved")
    from pyspark.sql.pandas.types import to_arrow_schema

    out = None
    for name, ddl in columns.items():
        rows = (spark.read.parquet(col_dir)
                .filter(F.col("name") == name)
                .select("chunk_id", "kind", "blob"))
        struct = spark.createDataFrame([], f"`{name}` {ddl}").schema
        target = to_arrow_schema(struct).field(0).type

        def dec(batches, _target=target, _name=name):
            for b in batches:
                if b.num_rows == 0:
                    continue
                kinds = b.column("kind").to_pylist()
                cids = b.column("chunk_id").to_pylist()
                parts = []
                for i, kind in enumerate(kinds):
                    arr = decode_column(kind, b.column("blob")[i]
                                        .as_buffer())
                    if arr.type != _target:
                        arr = arr.cast(_target)
                    # keys built columnar (pa.repeat chunk_id + arange
                    # ordinal — single C++ calls, never per-row Python
                    # lists; a dictionary-encoded key would be smaller on
                    # the channel but Spark's mapInArrow rejects
                    # dictionary output for a string column)
                    n = len(arr)
                    cid = pa.repeat(pa.scalar(cids[i], type=pa.string()),
                                    n)
                    parts.append(pa.RecordBatch.from_arrays(
                        [cid,
                         pa.array(np.arange(n, dtype=np.int64)),
                         arr],
                        names=["__cid", "__ord", _name]))
                for rb in parts:
                    yield rb

        one = rows.mapInArrow(
            dec, f"__cid string, __ord bigint, `{name}` {ddl}")
        out = (one if out is None
               else out.join(one, ["__cid", "__ord"], "full_outer"))
    return out.drop("__cid", "__ord")
