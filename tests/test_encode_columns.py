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
    # no refusals: floats hit the specialized path, exotic types the
    # arrow-ipc fallback
    kind, _ = encode_column(pa.array([1.5, 2.5]))
    assert kind == "f64"
    kind, _ = encode_column(pa.array([b"x", b"yz"], type=pa.binary()))
    assert kind == "arrow"


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
    arr = pa.array(
        [{"a": 1, "b": [1, 2], "m": [("k", 1.5)]},
         None,
         {"a": 2, "b": [], "m": []}],
        type=pa.struct([("a", pa.int64()),
                        ("b", pa.list_(pa.int32())),
                        ("m", pa.map_(pa.string(), pa.float64()))]))
    kind, blob = encode_column(arr)
    assert kind == "arrow"
    out = decode_column(kind, blob)
    assert out.to_pylist() == arr.to_pylist()


def test_arrow_ipc_fallback_timestamp_decimal():
    import datetime
    import decimal
    ts = pa.array([datetime.datetime(2026, 1, 1, 12, 0, 0), None],
                  type=pa.timestamp("us"))
    dec = pa.array([decimal.Decimal("1234.56"), None],
                   type=pa.decimal128(10, 2))
    for arr in (ts, dec):
        kind, blob = encode_column(arr)
        assert kind == "arrow"
        assert decode_column(kind, blob).to_pylist() == arr.to_pylist()
