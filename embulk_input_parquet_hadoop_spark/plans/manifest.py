"""Resumable manifest: per-wave commit records with lineage + codec metrics.

The reference explicitly lacks resume ("Resume supported: no",
``/root/reference/README.md:9``); the north rule adds it. Design:

- ``{out}/chunks/wave=K/``  chunk rows (blobs) — overwritten idempotently
- ``{out}/manifest/``       append-only wave commit rows, written *after*
  the wave's chunk data is fully written (write-ahead ordering: a wave is
  complete iff its manifest row exists)
- chunk-level codec metrics are derived by re-reading the wave's chunk
  metadata with the ``blob`` column pruned — Parquet column pruning makes
  this a metadata-sized scan, not a data re-read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(out_dir: str) -> str:
    return f"{out_dir}/manifest"


def completed_waves(spark: SparkSession, out_dir: str) -> set[int]:
    path = _manifest_path(out_dir)
    if not os.path.isdir(path) or not any(
            f.endswith(".parquet") for f in os.listdir(path)):
        return set()
    rows = spark.read.parquet(path).select("wave_id").distinct().collect()
    return {r.wave_id for r in rows}


def _chunk_stats(chunks: DataFrame) -> DataFrame:
    return (chunks
            .select("chunk_id", "part_id", "n_rows", "n_tokens", "wall_ms",
                    F.explode("cols").alias("c"))
            .select("chunk_id", "part_id", "n_rows", "n_tokens", "wall_ms",
                    F.col("c.name").alias("column"),
                    F.col("c.kind").alias("kind"),
                    F.col("c.n_values").alias("n_values"),
                    F.col("c.raw_bytes").alias("raw_bytes"),
                    F.col("c.enc_bytes").alias("enc_bytes")))


def wave_chunk_stats(spark: SparkSession, out_dir: str,
                     wave_id: int) -> DataFrame:
    """Per-(chunk, column) metrics for one wave; blob column pruned."""
    return _chunk_stats(spark.read.parquet(f"{out_dir}/chunks/wave={wave_id}"))


def all_chunk_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """Per-(chunk, column) metrics across all committed waves."""
    return _chunk_stats(spark.read.parquet(f"{out_dir}/chunks"))


def commit_wave(spark: SparkSession, out_dir: str, wave_id: int,
                files: list[str], wall_s: float) -> dict:
    """Aggregate the wave's chunk metrics and append its manifest row."""
    stats = wave_chunk_stats(spark, out_dir, wave_id)
    row = (stats.groupBy()
           .agg(F.countDistinct("chunk_id").alias("n_chunks"),
                (F.sum("raw_bytes")).alias("raw_bytes"),
                (F.sum("enc_bytes")).alias("enc_bytes"))
           .collect()[0])
    per_chunk = (stats.select("chunk_id", "n_rows", "n_tokens").distinct()
                 .groupBy().agg(F.sum("n_rows").alias("n_rows"),
                                F.sum("n_tokens").alias("n_tokens"))
                 .collect()[0])
    out = {
        "wave_id": wave_id,
        "n_chunks": int(row.n_chunks or 0),
        "n_rows": int(per_chunk.n_rows or 0),
        "n_tokens": int(per_chunk.n_tokens or 0),
        "raw_bytes": int(row.raw_bytes or 0),
        "enc_bytes": int(row.enc_bytes or 0),
        "wall_s": float(wall_s),
    }
    mdf = spark.createDataFrame(
        [(wave_id, files, out["n_chunks"], out["n_rows"], out["n_tokens"],
          out["raw_bytes"], out["enc_bytes"], float(wall_s))],
        "wave_id int, input_files array<string>, n_chunks long, n_rows long, "
        "n_tokens long, raw_bytes long, enc_bytes long, wall_s double")
    mdf.coalesce(1).write.mode("append").parquet(_manifest_path(out_dir))
    return out


def read_manifest(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(_manifest_path(out_dir))
