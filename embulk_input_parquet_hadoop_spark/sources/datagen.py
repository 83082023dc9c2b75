"""Deterministic synthetic token-table generator.

Synthesises the ``input_hint`` table shape — ``(doc_id: string,
tokens: array<int32> not null, n_tok: int32, source: string)`` — at any
scale, seeded, with the distributions the north rule's skew handling must
survive: Zipfian token ids (natural-language token frequency), log-normal
heavy-tailed document lengths, low-cardinality skewed ``source``.

Written directly with pyarrow (no Spark needed) in bounded row batches so
generation is O(batch) memory at any scale. This is the sized-down mirror of
the 10^12-sequence corpus named in BASELINE.json; no external data is used.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50257  # GPT-2-ish vocabulary size
SOURCES = ["web", "books", "code", "wiki", "forums"]
SOURCE_WEIGHTS = [0.55, 0.15, 0.15, 0.10, 0.05]  # skewed on purpose
MEAN_LOG_LEN = 5.2  # exp(5.2) ~ 181 tokens median
SIGMA_LOG_LEN = 1.0
MAX_LEN = 8192

SCHEMA = pa.schema([
    pa.field("doc_id", pa.string(), nullable=False),
    pa.field("tokens", pa.list_(pa.field("item", pa.int32(),
                                         nullable=False)), nullable=False),
    pa.field("n_tok", pa.int32(), nullable=False),
    pa.field("source", pa.string(), nullable=False),
])


def _gen_batch(rng: np.random.Generator, start: int, n: int) -> pa.RecordBatch:
    src_idx = rng.choice(len(SOURCES), size=n, p=SOURCE_WEIGHTS)
    n_tok = np.clip(rng.lognormal(MEAN_LOG_LEN, SIGMA_LOG_LEN, n), 1,
                    MAX_LEN).astype(np.int32)
    total = int(n_tok.sum())
    # Zipfian token ids; a=1.2 gives a realistic heavy head
    flat = (rng.zipf(1.2, total) % VOCAB).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int64()).cast(pa.int32()),
        pa.array(flat, type=pa.int32()))
    doc_id = pa.array([f"{SOURCES[s]}-{i:012x}"
                       for i, s in zip(range(start, start + n), src_idx)])
    source = pa.array([SOURCES[s] for s in src_idx])
    return pa.RecordBatch.from_arrays(
        [doc_id, tokens.cast(SCHEMA.field("tokens").type),
         pa.array(n_tok, type=pa.int32()), source], schema=SCHEMA)


def generate(out_path: str, n_docs: int, seed: int = 42,
             batch_rows: int = 100_000, n_files: int = 8,
             start_doc: int = 0) -> str:
    """Write ``n_docs`` rows as ``n_files`` parquet files under ``out_path``.

    Multiple files mirror the reference's unit of parallelism (one task per
    file, ``ParquetHadoopInputPlugin.java:116``) and give Spark natural input
    splits; also the unit of our resumable encode waves.
    """
    os.makedirs(out_path, exist_ok=True)
    rng = np.random.default_rng(seed)
    per_file = max(1, (n_docs + n_files - 1) // n_files)
    written = 0
    fidx = 0
    while written < n_docs:
        rows_this_file = min(per_file, n_docs - written)
        fname = os.path.join(out_path, f"part-{fidx:05d}.parquet")
        with pq.ParquetWriter(fname, SCHEMA, compression="zstd") as w:
            done = 0
            while done < rows_this_file:
                n = min(batch_rows, rows_this_file - done)
                w.write_batch(_gen_batch(rng, start_doc + written + done, n))
                done += n
        written += rows_this_file
        fidx += 1
    return out_path


def sf_to_docs(sf: float) -> int:
    """Scale factor -> row count: sf=0.1 ~ 60k docs (~11M tokens)."""
    return max(100, int(600_000 * sf))
