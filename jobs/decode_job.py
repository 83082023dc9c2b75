"""Export an encoded tree back to a plain Parquet table.

The consumer-facing inverse of ``encode_job``: manifest-gated chunk
read -> optional zone-map range pruning -> distributed decode ->
``df.write.parquet``. Completes the lifecycle for downstream systems
that want ordinary Parquet (a trainer's data loader, an ad-hoc DuckDB
session) without linking the decode kernels.

    spark-submit --py-files pkg.zip jobs/decode_job.py \
        --input /data/encoded --output /data/tokens_export \
        --range n_tok:128:4096

Only committed waves are visible (the manifest gate), so an export
taken mid-encode is a consistent snapshot of whole waves. The range
filter prunes at chunk granularity BEFORE any payload decode and
re-applies exactly on the decoded rows — the reader-side analogue of
Parquet row-group statistics pruning.

Prints one JSON line: rows exported, wall seconds, output path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from embulk_input_parquet_hadoop_spark.plans import pipeline  # noqa: E402
from embulk_input_parquet_hadoop_spark.plans.verify import (  # noqa: E402
    TOKENS_SPARK_SCHEMA)
from embulk_input_parquet_hadoop_spark.session import get_spark  # noqa: E402


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="encoded tree (out_dir "
                   "of encode_job)")
    p.add_argument("--output", required=True,
                   help="parquet output directory")
    p.add_argument("--schema", default=TOKENS_SPARK_SCHEMA,
                   help="DDL of the decoded table (default: the "
                        "input-hint tokens schema)")
    p.add_argument("--columns", default=None,
                   help="comma-separated column projection (default: "
                        "every schema column)")
    p.add_argument("--range", action="append", default=None,
                   metavar="COL:LO:HI",
                   help="zone-map-pruned int range filter, repeatable; "
                        "empty LO/HI means unbounded (e.g. n_tok:128:)")
    p.add_argument("--format",
                   choices=("parquet", "json", "avro", "iceberg",
                            "delta"),
                   default="parquet",
                   help="output format: parquet; json (JSON-lines, "
                        "one object per row — the raw-corpus exchange "
                        "shape; add --json-gzip to compress); avro "
                        "(container files via the pure-Python writer, "
                        "deflate codec, one file per non-empty "
                        "partition); iceberg (single-snapshot "
                        "unpartitioned Iceberg v2 table — parquet data "
                        "+ spec-shaped metadata via the pure-Python "
                        "Avro writer); or delta (one-commit Delta "
                        "table: _delta_log protocol+metaData+add "
                        "actions with numRecords stats) — both "
                        "readable by any engine speaking the format")
    p.add_argument("--json-gzip", action="store_true",
                   help="with --format json: gzip-compress part files")
    p.add_argument("--partition-by", default=None, metavar="COLS",
                   help="with --format delta: comma-separated partition "
                        "columns — hive-layout export with "
                        "partitionColumns/partitionValues in the log")
    p.add_argument("--overwrite", action="store_true",
                   help="replace an existing output directory")
    p.add_argument("--cores", type=int, default=None,
                   help="local[N] run without spark-submit")
    args = p.parse_args()

    if args.cores is not None:
        spark = get_spark("decode-job", cores=args.cores)
    else:
        from pyspark.sql import SparkSession
        spark = SparkSession.builder.appName("decode-job").getOrCreate()

    full = spark.createDataFrame([], args.schema).schema
    if args.columns:
        columns = args.columns.split(",")
        unknown = [c for c in columns if c not in full.fieldNames()]
        if unknown:
            raise SystemExit(f"--columns {unknown} not in schema "
                             f"{full.simpleString()}")
        schema = ", ".join(f"{full[c].name} {full[c].dataType.simpleString()}"
                           for c in columns)
    else:
        columns = full.fieldNames()
        schema = args.schema
    ranges = None
    if args.range:
        ranges = {}
        for spec in args.range:
            col, lo, hi = spec.split(":")
            ranges[col] = (int(lo) if lo else None, int(hi) if hi else None)

    t0 = time.perf_counter()
    df = pipeline.read_decoded(spark, args.input, columns, schema,
                               int_ranges=ranges)
    mode = "overwrite" if args.overwrite else "errorifexists"
    if args.partition_by and args.format != "delta":
        raise SystemExit("--partition-by requires --format delta")
    if args.format == "json":
        w = df.write.mode(mode)
        if args.json_gzip:
            w = w.option("compression", "gzip")
        w.json(args.output)
        # explicit schema: skips a full inference pass AND survives an
        # empty export (inference over zero rows raises)
        rows = spark.read.schema(df.schema).json(args.output).count()
    elif args.format == "avro":
        if args.json_gzip:
            raise SystemExit("--json-gzip requires --format json")
        from embulk_input_parquet_hadoop_spark.plans import fsutil
        from embulk_input_parquet_hadoop_spark.sources import (avro_io,
                                                               jsonl_io)
        if fsutil.exists(args.output):
            if not args.overwrite:
                raise SystemExit(f"output {args.output} exists "
                                 "(use --overwrite)")
            # deterministic part names: stale parts from a previous
            # wider run would otherwise survive an overwrite
            fsutil.rmtree_any(args.output)
        res = jsonl_io.export_avro(df, args.output)
        # readback gate: block headers carry record counts, so the
        # check is O(blocks) ranged reads — never the payload bytes,
        # never the whole file in memory
        rows = sum(avro_io.avro_record_count_ranged(f)
                   for f in res["files"])
        assert rows == res["n_rows"], (rows, res["n_rows"])
    elif args.format in ("iceberg", "delta"):
        if args.json_gzip:
            raise SystemExit("--json-gzip requires --format json")
        from embulk_input_parquet_hadoop_spark.plans import fsutil
        from embulk_input_parquet_hadoop_spark.sources import iceberg_meta
        if not fsutil.is_local(args.output):
            # refuse BEFORE any destructive --overwrite cleanup: the
            # exporters are local-only, so a remote target must never
            # reach the rmtree below with nothing written after it
            raise SystemExit(f"--format {args.format} writes local "
                             "trees only; copy or mount remote targets")
        if fsutil.exists(args.output):
            if not args.overwrite:
                raise SystemExit(f"output {args.output} exists "
                                 "(use --overwrite)")
            fsutil.rmtree_any(args.output)
        if args.format == "iceberg":
            res = iceberg_meta.export_table(df, args.output)
        else:
            from embulk_input_parquet_hadoop_spark.sources import (
                delta_meta)
            res = delta_meta.export_table(
                df, args.output,
                partition_by=(args.partition_by.split(",")
                              if args.partition_by else None))
        # export_table's readback gate already reconciled the snapshot
        # file list and manifest record counts against the written data
        rows = res["n_rows"]
    else:
        if args.json_gzip:
            raise SystemExit("--json-gzip requires --format json")
        df.write.mode(mode).parquet(args.output)
        rows = spark.read.parquet(args.output).count()
    print(json.dumps({"rows": rows,
                      "wall_s": round(time.perf_counter() - t0, 3),
                      "output": args.output}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
