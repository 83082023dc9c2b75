"""Bit-packing codec: pack non-negative integers at a fixed bit width.

This is the write-side inverse of the Parquet ``BIT_PACKED``/``RLE`` pages
the reference decodes (encodings visible in its fixture metadata, e.g.
``parquet-msgpack/src/test/resources/test-data/spark/
proto-struct-with-array.parquet.meta`` -> ``ENC:BIT_PACKED,PLAIN,RLE``).

Pure numpy, no per-value Python. Values are packed little-endian bit-order:
value i occupies bits [i*w, (i+1)*w). Byte-aligned widths (8/16/32/64) take
a zero-copy-ish fast path.
"""

from __future__ import annotations

import numpy as np

MAX_WIDTH = 64
_ALIGNED = {8: np.uint8, 16: np.uint16, 32: np.uint32, 64: np.uint64}


def bit_width(max_value: int) -> int:
    """Bits needed for the non-negative value ``max_value`` (0 -> 0 bits)."""
    if max_value < 0:
        raise ValueError("bit_width requires non-negative input")
    return int(max_value).bit_length()


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative int values into ``width``-bit little-endian slots."""
    n = len(values)
    if width == 0 or n == 0:
        return b""
    if width > MAX_WIDTH:
        raise ValueError(f"width {width} > {MAX_WIDTH}")
    if width in _ALIGNED:
        return values.astype(_ALIGNED[width], copy=False).tobytes()
    v = values.astype(np.uint64, copy=False)
    shifts = np.arange(width, dtype=np.uint64)
    # (n, width) bit matrix, LSB-first per value; ravel -> global LSB-first
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    flat = bits.reshape(-1)
    pad = (-len(flat)) % 8
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(flat, bitorder="little").tobytes()


def unpack(payload: bytes, width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack`; returns uint64 array of length ``n``."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width in _ALIGNED:
        return np.frombuffer(payload, dtype=_ALIGNED[width])[:n].astype(np.uint64)
    bits = np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")
    bits = bits[: n * width].reshape(n, width)
    out = np.zeros(n, dtype=np.uint64)
    # O(width) vector ops, O(n) extra memory — avoids an (n, width) uint64 blow-up
    for j in range(width):
        out |= bits[:, j].astype(np.uint64) << np.uint64(j)
    return out
