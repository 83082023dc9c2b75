"""The encode pipeline: read -> (cluster/salt) -> mapInArrow(encode) -> write.

Lifecycle mirrors the reference's transaction/run split
(``ParquetHadoopInputPlugin.java:78-128``: driver plans the file list, the
host executor fans out one task per file) re-expressed Spark-first:

- the driver lists input files and groups them into *waves* (the resumable
  checkpoint unit; the reference has no resume — ``README.md:9`` — ours adds
  it per the north rule);
- within a wave, Spark's Parquet scan provides the splits; an optional
  clustering repartition co-locates rows by (source, length-bucket, salt) so
  chunks are homogeneous (better codec wins) and token-count skew is leveled
  across tasks;
- ``mapInArrow`` encodes each Arrow batch (one batch = one *chunk*, the
  analogue of a Parquet row group) entirely in vectorized numpy — the
  JVM->Python boundary is crossed per batch, never per row;
- chunk rows (metadata + framed binary blobs) are written as uncompressed
  Parquet (the container must not distort our codec's measured size), then a
  per-wave manifest row commits the wave.
"""

from __future__ import annotations

import time

import pyarrow as pa
from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.encode import decode_column, encode_column
from . import manifest as mf

# Stats live in top-level columns and a blob-free `cols` struct array;
# payloads sit in the parallel `blobs` array (cols[i] describes blobs[i]).
# Keeping the blobs OUT of the stats structs means every metadata read
# (manifest commit, metrics roll-ups, resume checks) prunes the payload
# column at the Parquet-scan level — a metadata-sized scan, never a data
# re-read — without relying on nested-schema pruning through explode().
CHUNK_SPARK_SCHEMA = (
    "chunk_id string, wave_id int, part_id int, batch_idx int, "
    "n_rows bigint, n_tokens bigint, raw_bytes bigint, enc_bytes bigint, "
    "wall_ms double, "
    "cols array<struct<name:string, kind:string, n_values:bigint, "
    "raw_bytes:bigint, enc_bytes:bigint>>, "
    "blobs array<binary>"
)

_COL_STRUCT = pa.struct([
    pa.field("name", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("n_values", pa.int64()),
    pa.field("raw_bytes", pa.int64()),
    pa.field("enc_bytes", pa.int64()),
])

CHUNK_ARROW_SCHEMA = pa.schema([
    pa.field("chunk_id", pa.string()),
    pa.field("wave_id", pa.int32()),
    pa.field("part_id", pa.int32()),
    pa.field("batch_idx", pa.int32()),
    pa.field("n_rows", pa.int64()),
    pa.field("n_tokens", pa.int64()),
    pa.field("raw_bytes", pa.int64()),
    pa.field("enc_bytes", pa.int64()),
    pa.field("wall_ms", pa.float64()),
    pa.field("cols", pa.list_(_COL_STRUCT)),
    pa.field("blobs", pa.list_(pa.binary())),
])


def make_encode_fn(wave_id: int):
    """Build the mapInArrow function for one wave (wave id via closure)."""

    def encode_batches(batches):
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        for bidx, batch in enumerate(batches):
            t0 = time.perf_counter()
            col_rows = []
            blobs = []
            n_tokens = 0
            for name in batch.schema.names:
                col = batch.column(name)
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                kind, blob = encode_column(col)
                if kind == "list_i32":
                    n_tokens += len(col.values) if col.offset == 0 else int(
                        col.offsets[-1].as_py() - col.offsets[0].as_py())
                col_rows.append({
                    "name": name,
                    "kind": kind,
                    "n_values": len(col),
                    "raw_bytes": col.nbytes,
                    "enc_bytes": len(blob),
                })
                blobs.append(blob)
            wall_ms = (time.perf_counter() - t0) * 1000.0
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array([f"w{wave_id}-p{pid}-b{bidx}"]),
                    pa.array([wave_id], type=pa.int32()),
                    pa.array([pid], type=pa.int32()),
                    pa.array([bidx], type=pa.int32()),
                    pa.array([batch.num_rows], type=pa.int64()),
                    pa.array([n_tokens], type=pa.int64()),
                    pa.array([sum(c["raw_bytes"] for c in col_rows)],
                             type=pa.int64()),
                    pa.array([sum(c["enc_bytes"] for c in col_rows)],
                             type=pa.int64()),
                    pa.array([wall_ms], type=pa.float64()),
                    pa.array([col_rows], type=pa.list_(_COL_STRUCT)),
                    pa.array([blobs], type=pa.list_(pa.binary())),
                ],
                schema=CHUNK_ARROW_SCHEMA)

    return encode_batches


def cluster_for_encode(df: DataFrame, num_partitions: int,
                       salt_buckets: int = 4) -> DataFrame:
    """Salted clustering repartition: (source, length-bucket, salt).

    Co-locates same-source, similar-length documents into the same chunk
    (homogeneous chunks -> smaller dictionaries, tighter FOR ranges) while
    the salt defeats skew from a dominant source or a heavy length bucket —
    the explicit skew control the north rule requires, replacing the
    reference's degenerate one-task-per-file plan
    (``ParquetHadoopInputPlugin.java:116``).
    """
    length_bucket = F.floor(F.log2(F.col("n_tok") + F.lit(1))).alias("_lb")
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets))
    return (df.repartition(num_partitions, F.col("source"), length_bucket,
                           salt)
              .sortWithinPartitions("source", "n_tok"))


def decode_chunks(chunks_df: DataFrame, column_order: list[str],
                  spark_schema: str) -> DataFrame:
    """Inverse of the encode map: chunk rows -> original-schema DataFrame."""

    def decode_batches(batches):
        for batch in batches:
            cols_list = batch.column("cols")
            blobs_list = batch.column("blobs")
            for i in range(batch.num_rows):
                row_cols = cols_list[i].as_py()
                row_blobs = blobs_list[i].as_py()
                by_name = {c["name"]: (c["kind"], row_blobs[j])
                           for j, c in enumerate(row_cols)}
                arrays = []
                for name in column_order:
                    kind, blob = by_name[name]
                    arrays.append(decode_column(kind, blob))
                yield pa.RecordBatch.from_arrays(arrays, names=column_order)

    return chunks_df.mapInArrow(decode_batches, spark_schema)


def encode_path(spark: SparkSession, input_path: str, out_dir: str,
                waves: int = 1, resume: bool = False,
                cluster_partitions: int | None = None) -> dict:
    """Run the full encode job; returns aggregate metrics.

    ``waves`` > 1 splits the input *file list* into that many sub-jobs, each
    committed to the manifest on completion — kill the job after wave k and a
    ``resume=True`` rerun processes only waves k+1.. (idempotent: each wave
    overwrites its own chunk subdirectory).
    """
    files = sorted(spark.read.parquet(input_path).inputFiles())
    if not files:
        # parity with the reference's empty-glob failure
        # (ParquetHadoopInputPlugin.java:92-94 -> PathNotFoundException)
        raise FileNotFoundError(f"no parquet files under {input_path}")
    wave_files: list[list[str]] = [files[i::waves] for i in range(waves)]
    wave_files = [w for w in wave_files if w]

    done = mf.completed_waves(spark, out_dir) if resume else set()
    totals = {"waves_run": 0, "waves_skipped": 0, "n_rows": 0, "n_tokens": 0,
              "raw_bytes": 0, "enc_bytes": 0, "wall_s": 0.0}
    for wave_id, wfiles in enumerate(wave_files):
        if wave_id in done:
            totals["waves_skipped"] += 1
            continue
        t0 = time.perf_counter()
        df = spark.read.parquet(*wfiles)
        if cluster_partitions:
            df = cluster_for_encode(df, cluster_partitions)
        enc = df.mapInArrow(make_encode_fn(wave_id), CHUNK_SPARK_SCHEMA)
        (enc.write.mode("overwrite")
            .option("compression", "uncompressed")
            .parquet(f"{out_dir}/chunks/wave={wave_id}"))
        wall_s = time.perf_counter() - t0
        stats = mf.commit_wave(spark, out_dir, wave_id, wfiles, wall_s)
        totals["waves_run"] += 1
        totals["n_rows"] += stats["n_rows"]
        totals["n_tokens"] += stats["n_tokens"]
        totals["raw_bytes"] += stats["raw_bytes"]
        totals["enc_bytes"] += stats["enc_bytes"]
        totals["wall_s"] += wall_s
    return totals


def read_chunks(spark: SparkSession, out_dir: str) -> DataFrame:
    # partition discovery on the chunks root ('wave=K' subdirs); the wave id
    # is also stored in the data (wave_id), so we drop the partition column
    return spark.read.parquet(f"{out_dir}/chunks").drop("wave")
