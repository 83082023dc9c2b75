"""Chunk framing: self-describing binary frames for encoded sub-chunks.

A *column blob* is a sequence of frames (e.g. a ``tokens`` list column is
``[offsets frame, values frame]``). Each frame records codec, logical dtype,
value count, codec params (compact JSON — tiny, per chunk not per value) and
a CRC32 of the payload. This plays the role of Parquet's page/column-chunk
headers that the reference walks on the read side
(``ParquetRowReader.java:73-118``: footer -> blocks -> column chunks), made
explicit on our write side so decode is language-neutral and bit-exact.

Frame layout (little-endian):
    magic  2s   b"CF"
    ver    B    1
    codec  B    codec id (see CODEC_IDS)
    dtype  B    logical dtype id (see DTYPE_IDS)
    n      I    value count
    plen   I    params JSON length
    paylen Q    payload length
    crc    I    crc32(payload)
    params plen bytes (UTF-8 JSON)
    payload paylen bytes
"""

from __future__ import annotations

import json
import struct
import zlib
from dataclasses import dataclass

MAGIC = b"CF"
VERSION = 1
_HEADER = struct.Struct("<2sBBBIIQI")

CODEC_IDS = {
    "plain": 0,
    "for": 1,
    "delta": 2,
    "rle": 3,
    "dict": 4,
    "bytes_plain": 5,
    "fsst": 6,
    "xp": 7,
    "rans": 8,
}
CODEC_NAMES = {v: k for k, v in CODEC_IDS.items()}

DTYPE_IDS = {
    "int8": 0,
    "int16": 1,
    "int32": 2,
    "int64": 3,
    "bytes": 4,
    "uint1": 5,  # validity bitmap
}
DTYPE_NAMES = {v: k for k, v in DTYPE_IDS.items()}


class FrameError(ValueError):
    pass


@dataclass
class Frame:
    codec: str
    dtype: str
    n: int
    params: dict
    payload: bytes


def write_frame(codec: str, dtype: str, n: int, params: dict,
                payload: bytes) -> bytes:
    pjson = json.dumps(params, separators=(",", ":")).encode()
    header = _HEADER.pack(MAGIC, VERSION, CODEC_IDS[codec], DTYPE_IDS[dtype],
                          n, len(pjson), len(payload),
                          zlib.crc32(payload) & 0xFFFFFFFF)
    return header + pjson + payload


def read_frame(buf, offset: int = 0) -> tuple[Frame, int]:
    """Parse one frame at ``offset``; returns (frame, next_offset).

    ``buf`` may be ``bytes`` or any buffer-protocol object (memoryview,
    ``pa.Buffer``); payloads are returned as zero-copy views into it —
    decoding a chunk must not copy the blob out of the Arrow batch
    (VERDICT r1: the per-chunk ``.as_py()`` copy was half the decode gap).
    """
    magic, ver, codec_id, dtype_id, n, plen, paylen, crc = _HEADER.unpack_from(
        buf, offset)
    if magic != MAGIC or ver != VERSION:
        raise FrameError(f"bad frame magic/version at offset {offset}")
    pos = offset + _HEADER.size
    params = json.loads(bytes(buf[pos:pos + plen]).decode())
    pos += plen
    payload = buf[pos:pos + paylen]
    pos += paylen
    if (zlib.crc32(payload) & 0xFFFFFFFF) != crc:
        raise FrameError(f"payload CRC mismatch at offset {offset}")
    return Frame(CODEC_NAMES[codec_id], DTYPE_NAMES[dtype_id], n, params,
                 payload), pos


def read_frames(buf) -> list[Frame]:
    if not isinstance(buf, bytes):
        buf = memoryview(buf)
    frames, pos = [], 0
    while pos < len(buf):
        frame, pos = read_frame(buf, pos)
        frames.append(frame)
    return frames
