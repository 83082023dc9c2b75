"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference treats unknown BINARY columns as raw bytes and carries them
through its decode untouched (``ParquetValueConverter.java:236-243``,
``ParquetPrimitiveConverter.java:72-77``); we extend that to a first-class
media pipeline shape for training data:

    media(doc_id string, kind string, width int, height int, n_frames int,
          sample_rate int, payload binary)

Spark-side plumbing (schema, partitioning, Arrow batch shape, vectorized
kernels) is real and tested. The *actual* image/audio decoding is stubbed
behind ``decode_real_media`` (the codec libraries are not in this
container); everything downstream operates on the deterministic synthetic
payloads from :func:`synth_media`, so the pipeline is exercised end-to-end.

All per-batch kernels are vectorized over the Arrow binary column's
(offsets, values) buffers with ``np.add.reduceat`` — no per-row Python
arithmetic, per the input_hint's no-per-row-Python rule.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_KINDS = ["image", "audio", "video"]

FEATURE_SCHEMA = ("doc_id string, kind string, n_bytes int, "
                  "mean_val double, min_val int, max_val int, checksum bigint")


def synth_media(docs: DataFrame, payload_reps: int = 8) -> DataFrame:
    """Deterministic fake media table derived from documents.

    Payload = repeated md5 bytes of doc_id (opaque, incompressible-ish,
    deterministic across engines); metadata typed per kind. Pure built-in
    functions — JVM-side, no UDF.
    """
    kind_idx = F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(3))
    payload = F.to_binary(
        F.repeat(F.md5(F.col("doc_id").cast("string")), payload_reps),
        F.lit("hex"))
    return (docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.element_at(F.array(*[F.lit(k) for k in MEDIA_KINDS]),
                     (kind_idx + 1).cast("int")).alias("kind"),
        F.lit(16).alias("width"),
        F.lit(payload_reps).alias("height"),
        F.when(kind_idx == 2, F.lit(4)).otherwise(F.lit(1))
        .alias("n_frames"),
        F.when(kind_idx == 1, F.lit(16000)).otherwise(F.lit(0))
        .alias("sample_rate"),
        payload.alias("payload")))


def _binary_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets int64[n+1], values uint8) views of an Arrow binary array.

    The values are sliced to the logical window [offs[0], offs[-1]) and the
    offsets rebased to 0: a sliced/offset input array (or one with trailing
    buffer bytes) would otherwise mismatch ``np.repeat(starts, sizes)``
    against ``len(data)`` and let ``reduceat``'s last range span stray
    bytes (ADVICE r1, multimodal.py:115).
    """
    arr = arr.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset: arr.offset + len(arr) + 1]
    buf = arr.buffers()[2]
    data = (np.frombuffer(buf, dtype=np.uint8) if buf is not None
            else np.zeros(0, dtype=np.uint8))
    data = data[offs[0]: offs[-1]] if len(offs) else data
    return offs - (offs[0] if len(offs) else 0), data


def extract_features(media: DataFrame) -> DataFrame:
    """Per-payload byte statistics, fully vectorized per Arrow batch.

    mean/min/max/checksum over each payload without any per-row Python:
    one ``np.add.reduceat``/``np.minimum.reduceat`` pass over the batch's
    concatenated payload bytes.
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            pay = batch.column("payload")
            if isinstance(pay, pa.ChunkedArray):
                pay = pay.combine_chunks()
            offs, data = _binary_buffers(pay)
            n = len(offs) - 1
            sizes = np.diff(offs)
            starts = offs[:-1]
            # One sentinel element appended so a start index == len(data)
            # (empty payloads at the end of the batch) stays a valid
            # reduceat index WITHOUT clamping — clamping a start shrinks
            # the range of the preceding non-empty payload and corrupts
            # its stats. The sentinel also joins the LAST payload's
            # reduction range, so each reduction gets its own identity
            # sentinel (0 for sums, +/-2^62 for min/max).
            d = data.astype(np.int64)

            def ext(sentinel):
                return np.concatenate(
                    [d, np.array([sentinel], dtype=np.int64)])

            sums = np.add.reduceat(ext(0), starts)
            mins = np.minimum.reduceat(ext(1 << 62), starts)
            maxs = np.maximum.reduceat(ext(-(1 << 62)), starts)
            # rows with size 0 got reduceat's single-element identity
            # (value at their start index); zero them out
            empty = sizes == 0
            sums[empty] = 0
            mins[empty] = 0
            maxs[empty] = 0
            mean = np.divide(sums, sizes, out=np.zeros(n, dtype=np.float64),
                             where=sizes > 0)
            # positional checksum: sum(byte * (1 + pos_in_payload)) mod 2^31
            pos = np.zeros(len(data) + 1, dtype=np.int64)
            pos[:-1] = np.arange(len(data), dtype=np.int64)
            pos[:-1] -= np.repeat(starts, sizes.astype(np.int64))
            weighted = ext(0) * (pos + 1)
            weighted[-1] = 0  # sentinel contributes nothing
            csums = np.add.reduceat(weighted, starts)
            csums[empty] = 0
            yield pa.RecordBatch.from_arrays(
                [batch.column("doc_id"), batch.column("kind"),
                 pa.array(sizes.astype(np.int32)),
                 pa.array(mean),
                 pa.array(mins.astype(np.int32)),
                 pa.array(maxs.astype(np.int32)),
                 pa.array(csums % (2 ** 31))],
                names=["doc_id", "kind", "n_bytes", "mean_val", "min_val",
                       "max_val", "checksum"])

    return media.select("doc_id", "kind", "payload").mapInArrow(
        kernel, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, stride: int = 2) -> DataFrame:
    """Keep every ``stride``-th frame of each payload (frame = payload
    split into n_frames equal slices). Vectorized gather over the batch's
    concatenated bytes; output schema == input schema with new payload."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            pay = batch.column("payload")
            if isinstance(pay, pa.ChunkedArray):
                pay = pay.combine_chunks()
            offs, data = _binary_buffers(pay)
            sizes = np.diff(offs)
            nf = np.asarray(batch.column("n_frames"), dtype=np.int64)
            frame_len = np.floor_divide(sizes, nf,
                                        out=np.zeros_like(sizes),
                                        where=nf > 0)
            kept = (nf + stride - 1) // stride
            # gather index: for each row, frames 0, stride, 2*stride, ...
            out_sizes = kept * frame_len
            out_offs = np.zeros(len(sizes) + 1, dtype=np.int64)
            np.cumsum(out_sizes, out=out_offs[1:])
            idx = np.empty(int(out_sizes.sum()), dtype=np.int64)
            # per-row frame starts: vectorized per frame rank (<= max kept,
            # a handful), not per row
            max_kept = int(kept.max()) if len(kept) else 0
            for k in range(max_kept):
                rows = np.flatnonzero(kept > k)
                fstart = offs[:-1][rows] + k * stride * frame_len[rows]
                dst = out_offs[:-1][rows] + k * frame_len[rows]
                # copy each kept frame via one big fancy-index per rank
                span = frame_len[rows]
                reps = np.repeat(fstart, span) + _intra_offsets(span)
                dsts = np.repeat(dst, span) + _intra_offsets(span)
                idx[dsts] = reps
            new_pay = pa.LargeBinaryArray.from_buffers(
                pa.large_binary(), len(sizes),
                [None, pa.py_buffer(out_offs.tobytes()),
                 pa.py_buffer(data[idx].tobytes())]).cast(pa.binary())
            arrays = [batch.column(c) if c != "payload" else new_pay
                      for c in batch.schema.names]
            yield pa.RecordBatch.from_arrays(arrays,
                                             names=batch.schema.names)

    return media.mapInArrow(kernel, media.schema)


def _intra_offsets(span: np.ndarray) -> np.ndarray:
    """[0..span0-1, 0..span1-1, ...] without Python loops."""
    total = int(span.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    ends = np.cumsum(span)[:-1]
    out[0] = 0
    out[ends] = 1 - span[:-1]
    return np.cumsum(out)


def decode_real_media(media: DataFrame, target_size: tuple[int, int] = (224, 224)):
    """Decode actual image/audio codecs and resize — STUB.

    The sandbox has no image/audio libraries; on a real cluster this would
    be a ``mapInPandas`` over payload bytes using PIL/libsndfile, with the
    exact batch shape used by :func:`extract_features`. Raises unless a
    decoder library is importable.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real media decoding needs PIL/soundfile, not present in this "
            "environment; use synth_media + extract_features for the "
            "pipeline shape") from exc

    def kernel(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        import PIL.Image as Image
        for pdf in pdfs:
            decoded = []
            for buf in pdf["payload"]:
                img = Image.open(io.BytesIO(buf)).resize(target_size)
                decoded.append(np.asarray(img).tobytes())
            pdf = pdf.assign(payload=decoded)
            yield pdf

    return media.mapInPandas(kernel, media.schema)
