"""Arrow column encoder round-trips: int, list<int32> (tokens), string."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from embulk_input_parquet_hadoop_spark.operators.encode import (
    decode_column, encode_column)

RNG = np.random.default_rng(7)


def _roundtrip(arr: pa.Array) -> pa.Array:
    kind, blob = encode_column(arr)
    return decode_column(kind, blob)


def test_int32_roundtrip():
    arr = pa.array(RNG.integers(-1000, 1000, 5000, dtype=np.int32))
    assert _roundtrip(arr).equals(arr)


def test_int64_roundtrip_with_nulls():
    vals = RNG.integers(0, 10**12, 3000).tolist()
    vals[::7] = [None] * len(vals[::7])
    arr = pa.array(vals, type=pa.int64())
    out = _roundtrip(arr)
    assert out.cast(pa.int64()).equals(arr)


def test_tokens_list_roundtrip():
    lengths = RNG.integers(0, 300, 2000)
    token_arrays = [RNG.integers(0, 65536, n, dtype=np.int32) for n in lengths]
    arr = pa.array([a.tolist() for a in token_arrays],
                   type=pa.list_(pa.int32()))
    out = _roundtrip(arr)
    assert out.equals(arr.cast(pa.list_(pa.int32())))


def test_tokens_bit_identity_per_row():
    token_arrays = [RNG.integers(-2**31, 2**31, n, dtype=np.int32)
                    for n in RNG.integers(1, 50, 500)]
    arr = pa.array([a.tolist() for a in token_arrays],
                   type=pa.list_(pa.int32()))
    out = _roundtrip(arr)
    for orig, dec in zip(token_arrays, out.to_pylist()):
        np.testing.assert_array_equal(np.array(dec, dtype=np.int32), orig)


def test_string_lowcard_roundtrip():
    arr = pa.array([f"source_{i % 5}" for i in range(4000)])
    kind, blob = encode_column(arr)
    assert kind == "str_dict"
    assert len(blob) < 4000 * 4  # dictionary beats raw
    assert decode_column(kind, blob).equals(arr)


def test_string_highcard_roundtrip():
    arr = pa.array([f"doc_{i:012d}_{i * 31 % 997}" for i in range(3000)])
    kind, blob = encode_column(arr)
    assert decode_column(kind, blob).equals(arr)


def test_string_with_nulls_and_unicode():
    vals = ["héllo", None, "", "wörld", None, "日本語テキスト", "x" * 1000]
    arr = pa.array(vals, type=pa.string())
    assert _roundtrip(arr).equals(arr)


def test_empty_arrays():
    assert _roundtrip(pa.array([], type=pa.int32())).equals(
        pa.array([], type=pa.int32()))
    out = _roundtrip(pa.array([], type=pa.list_(pa.int32())))
    assert len(out) == 0
    assert _roundtrip(pa.array([], type=pa.string())).equals(
        pa.array([], type=pa.string()))


def test_every_type_is_encodable():
    # no refusals: floats and binaries hit specialized paths, exotic types
    # (unions, dictionaries, ...) the arrow-ipc fallback
    kind, _ = encode_column(pa.array([1.5, 2.5]))
    assert kind == "f64"
    kind, _ = encode_column(pa.array([b"x", b"yz"], type=pa.binary()))
    assert kind == "bin"


# --- extended type coverage: floats, list<float>, arbitrary Arrow types ----

def test_float_roundtrip():
    import numpy as np
    rng = np.random.default_rng(4)
    for dt in (pa.float32(), pa.float64()):
        vals = rng.normal(size=5000).astype(dt.to_pandas_dtype())
        vals[17] = np.nan
        vals[42] = np.inf
        arr = pa.array(vals, type=dt)
        out = _roundtrip(arr)
        assert out.type == dt
        a, b = np.asarray(arr), np.asarray(out)
        assert np.array_equal(a.view("uint8"), b.view("uint8"))  # bit-exact


def test_float_with_nulls_roundtrip():
    arr = pa.array([1.5, None, -2.25, None, 0.0], type=pa.float32())
    out = _roundtrip(arr)
    assert out.to_pylist() == arr.to_pylist()


def test_list_f32_roundtrip_embeddings_shape():
    import numpy as np
    rng = np.random.default_rng(9)
    vecs = [rng.normal(size=64).astype(np.float32) for _ in range(300)]
    arr = pa.array([v.tolist() for v in vecs],
                   type=pa.list_(pa.float32()))
    out = _roundtrip(arr)
    got = np.stack([np.asarray(x) for x in out.to_pylist()],
                   dtype=np.float32)
    want = np.stack(vecs)
    assert np.array_equal(got.view("uint8"), want.view("uint8"))


def test_arrow_ipc_fallback_struct_map_nested():
    """Tiny nested chunks: fixed framing overhead dominates, so the
    per-chunk pick-best keeps the IPC competitor — either kind must
    round-trip; at 3 rows the winner is IPC."""
    arr = pa.array(
        [{"a": 1, "b": [1, 2], "m": [("k", 1.5)]},
         None,
         {"a": 2, "b": [], "m": []}],
        type=pa.struct([("a", pa.int64()),
                        ("b", pa.list_(pa.int32())),
                        ("m", pa.map_(pa.string(), pa.float64()))]))
    kind, blob = encode_column(arr)
    assert kind in ("arrow", "nested")
    out = decode_column(kind, blob)
    assert out.to_pylist() == arr.to_pylist()


def test_nested_shred_roundtrips():
    """VERDICT r2 #1: struct/map/list-of-anything shred recursively so
    leaves hit the real codecs; roundtrips stay bit-identical (Arrow
    equals) at every nesting shape, including slices and nulls."""
    cases = [
        pa.array([{"a": i, "b": f"s{i % 5}"} for i in range(2000)] + [None]),
        pa.array([[f"w{i % 7}", "x"] for i in range(1000)] + [None, []],
                 type=pa.list_(pa.string())),
        pa.array([[("k%d" % (i % 3), i)] for i in range(500)],
                 type=pa.map_(pa.string(), pa.int32())),
        pa.array([[float(i), i + 0.5] for i in range(500)],
                 type=pa.list_(pa.float32(), 2)),
        pa.array([{"tags": ["a", "b"], "meta": {"n": i}} for i in range(800)],
                 type=pa.struct([("tags", pa.list_(pa.string())),
                                 ("meta", pa.struct([("n", pa.int64())]))])),
        pa.array([[[1, 2], [3]], None, [[4]]] * 300,
                 type=pa.list_(pa.list_(pa.int64()))),
        pa.array([[1, 2], None, [3]] * 400, type=pa.list_(pa.int32())),
    ]
    from embulk_input_parquet_hadoop_spark.operators.encode import (
        encode_nested_column)
    for arr in cases:
        kind, blob = encode_nested_column(arr)
        assert kind == "nested"
        out = decode_column(kind, blob)
        if out.type != arr.type:
            out = out.cast(arr.type)
        assert out.equals(arr), arr.type
    # sliced nested arrays rebase offsets/validity correctly
    s = pa.array([{"a": i, "b": "x"} for i in range(100)]).slice(7, 50)
    kind, blob = encode_nested_column(s)
    assert decode_column(kind, blob).to_pylist() == s.to_pylist()
    sl = pa.array([[i, i + 1] for i in range(100)],
                  type=pa.list_(pa.int64())).slice(5, 60)
    kind, blob = encode_nested_column(sl)
    assert decode_column(kind, blob).to_pylist() == sl.to_pylist()


def test_bool_uint_binary_roundtrips():
    cases = [
        (pa.array([True, False, None] * 100), "bool"),
        (pa.array([True] * 50), "bool"),
        (pa.array([b"abc" * i for i in range(200)] + [None],
                  type=pa.binary()), "bin"),
        (pa.array([1, 2, None, 255], type=pa.uint8()), "uint"),
        (pa.array([0, 65535, 7], type=pa.uint16()), "uint"),
        (pa.array([0, 2 ** 32 - 1, None], type=pa.uint32()), "uint"),
        (pa.array([0, 2 ** 64 - 1, None, 12345], type=pa.uint64()), "uint"),
    ]
    for arr, want_kind in cases:
        kind, blob = encode_column(arr)
        assert kind == want_kind, arr.type
        out = decode_column(kind, blob)
        assert out.type == arr.type
        assert out.equals(arr), arr.type


def test_temporal_roundtrip_all_units():
    import datetime
    base = datetime.datetime(2026, 1, 1, 12, 0, 0)
    arrays = [
        pa.array([base, base + datetime.timedelta(hours=i)]
                 if i else [base, None], type=t)
        for i, t in enumerate([pa.timestamp("us"), pa.timestamp("ns"),
                               pa.timestamp("ms"),
                               pa.timestamp("us", tz="UTC"),
                               pa.timestamp("s", tz="America/New_York")])
    ]
    arrays += [
        pa.array([datetime.date(2026, 1, 1), None, datetime.date(1969, 7, 20)],
                 type=pa.date32()),
        pa.array([1000, None, 2 ** 40], type=pa.date64()),
        pa.array([datetime.time(12, 30), None], type=pa.time32("s")),
        pa.array([datetime.time(12, 30, 1, 5)], type=pa.time64("us")),
        pa.array([datetime.timedelta(seconds=5), None],
                 type=pa.duration("us")),
    ]
    for arr in arrays:
        kind, blob = encode_column(arr)
        assert kind == "temporal", arr.type
        out = decode_column(kind, blob)
        assert out.type == arr.type
        assert out.equals(arr), arr.type


def test_decimal_roundtrip_and_wide_fallback():
    import decimal
    dec = pa.array([decimal.Decimal("1234.56"), None,
                    decimal.Decimal("-0.01"),
                    decimal.Decimal("92233720368547758.07")],  # lo64 edge
                   type=pa.decimal128(20, 2))
    kind, blob = encode_column(dec)
    assert kind == "dec64"
    out = decode_column(kind, blob)
    assert out.type == dec.type
    assert out.equals(dec)
    # values needing the upper 64 bits encode both planes (VERDICT r2 #8;
    # the r2 engine fell back to IPC here)
    wide = pa.array([decimal.Decimal(2 ** 70), decimal.Decimal(-3), None],
                    type=pa.decimal128(38, 0))
    kind, blob = encode_column(wide)
    assert kind == "dec128"
    assert decode_column(kind, blob).equals(wide)


def test_wide_decimal_two_plane_beats_ipc():
    """The dec128 point: realistic wide decimals (hi plane low-entropy)
    compress through FOR/delta + zstd where IPC stores 16 raw bytes."""
    import decimal
    from embulk_input_parquet_hadoop_spark.operators.encode import (
        encode_arrow_ipc_column)
    base = 2 ** 70
    vals = [decimal.Decimal(base + i * 1000) for i in range(20_000)]
    arr = pa.array(vals, type=pa.decimal128(38, 0))
    kind, blob = encode_column(arr)
    assert kind == "dec128"
    _, ipc_blob = encode_arrow_ipc_column(arr)
    assert len(blob) < 0.6 * len(ipc_blob), (len(blob), len(ipc_blob))
    assert decode_column(kind, blob).equals(arr)


def test_decimal_sliced_offset():
    import decimal
    base = pa.array([decimal.Decimal(i) for i in range(10)],
                    type=pa.decimal128(12, 0)).slice(3, 4)
    kind, blob = encode_column(base)
    assert kind == "dec64"
    assert decode_column(kind, blob).equals(base)


def test_temporal_codec_beats_ipc_fallback():
    """The point of the dedicated path: hourly event times compress far
    better through FOR/delta than through the generic IPC+zstd fallback."""
    import numpy as np
    from embulk_input_parquet_hadoop_spark.operators.encode import (
        encode_arrow_ipc_column)
    rng = np.random.default_rng(11)
    # an ordered event stream with second-granularity timestamps stored in
    # microseconds (typical log/event data): small structured deltas
    us = (1_700_000_000_000_000
          + np.cumsum(rng.integers(0, 10, 20_000)) * 1_000_000)
    arr = pa.array(us, type=pa.int64()).view(pa.timestamp("us"))
    kind, blob = encode_column(arr)
    assert kind == "temporal"
    _, ipc_blob = encode_arrow_ipc_column(arr)
    assert len(blob) < 0.5 * len(ipc_blob), (len(blob), len(ipc_blob))
    assert decode_column(kind, blob).equals(arr)
