"""Encode->decode roundtrip over the reference's own cross-implementation
compat corpus — impala / parquet-cpp / Drill / thrift / proto files,
including the unannotated-repeated-group shapes (S18).

The reference proves its decode against exactly these files
(``parquet-msgpack/src/test/java/.../compat/TestParquetCompatibility.java:
49-82``; fixtures under ``parquet-msgpack/src/test/resources/test-data/``).
We prove the inverse contract: every column of every fixture encodes
through the codec cascade (or the Arrow-IPC fallback for nested shapes)
and decodes bit-identical. Pure pyarrow — no Spark needed, the codec layer
is the unit under test.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from embulk_input_parquet_hadoop_spark.operators.encode import (
    decode_column, encode_column)

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "compat")
FIXTURES = sorted(glob.glob(f"{FIXTURE_DIR}/*.parquet"))


def test_corpus_present():
    # the full reference compat corpus rides along as test data
    assert len(FIXTURES) >= 20


@pytest.mark.parametrize("path", FIXTURES,
                         ids=[os.path.basename(p) for p in FIXTURES])
def test_column_roundtrip_bit_identical(path):
    t = pq.read_table(path)
    assert t.num_rows > 0
    for name in t.schema.names:
        col = t.column(name).combine_chunks()
        kind, blob = encode_column(col)
        dec = decode_column(kind, blob)
        if dec.type != col.type:
            dec = dec.cast(col.type)
        assert dec.equals(col), \
            f"{os.path.basename(path)}:{name} (kind={kind})"
