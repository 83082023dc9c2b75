"""Fixed-window sequence packing: distributed offsets + window re-cut.

The invariant: packing is a pure re-cut of the id-ordered token
concatenation — window w holds exactly global positions [w*L, (w+1)*L),
nothing padded, dropped, or reordered. Each test checks against a plain
local (numpy) reference on the same data.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import pack


def _local_pack(docs: list[tuple[int, list[int]]], L: int):
    """Reference implementation: concatenate in id order, cut every L."""
    stream: list[int] = []
    for _id, toks in sorted(docs):
        stream.extend(toks)
    return {w: stream[w * L:(w + 1) * L]
            for w in range((len(stream) + L - 1) // L)}


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, t) for i, t in docs], "doc_id long, tokens array<int>")


RNG = np.random.default_rng(99)
DOCS = [(int(i), RNG.integers(0, 50257, int(n)).tolist())
        for i, n in enumerate(RNG.integers(1, 400, 120))]
DOCS += [(500, []), (501, [7] * 1000)]  # empty doc + doc spanning windows


@pytest.mark.parametrize("L", [1, 17, 256])
def test_pack_matches_local_reference(spark, L):
    got = {r["seq_id"]: r["tokens"] for r in
           pack.pack_sequences(_docs_df(spark, DOCS), L).collect()}
    want = _local_pack(DOCS, L)
    assert got == want


def test_pack_exact_boundary_and_drop_last(spark):
    # doc lengths aligned so windows end exactly on doc boundaries
    docs = [(0, list(range(64))), (1, list(range(64, 128))),
            (2, list(range(128, 160)))]  # 160 tokens, L=64 -> last is short
    df = _docs_df(spark, docs)
    full = {r["seq_id"]: r["tokens"]
            for r in pack.pack_sequences(df, 64).collect()}
    assert full == {0: list(range(64)), 1: list(range(64, 128)),
                    2: list(range(128, 160))}
    kept = pack.pack_sequences(df, 64, drop_last=True)
    assert {r["seq_id"] for r in kept.collect()} == {0, 1}
    assert kept.filter(F.col("n_tok") != 64).count() == 0


def test_bucketed_offsets_equal_global_window(spark):
    df = _docs_df(spark, DOCS)
    meta = (df.select("doc_id", F.size("tokens").cast("long").alias("n"))
            .filter(F.col("n") > 0))
    bucketed = {r["doc_id"]: r["s"] for r in
                pack._bucketed_offsets(meta, "doc_id", 8).collect()}
    windowed = {r["doc_id"]: r["s"] for r in
                pack._windowed_offsets(meta, "doc_id").collect()}
    assert bucketed == windowed
    # offsets are the exclusive prefix sum of doc lengths in id order
    run = 0
    for _id, toks in sorted(DOCS):
        if not toks:
            continue
        assert bucketed[_id] == run
        run += len(toks)


def test_string_id_packing(spark):
    docs = [(f"doc-{i:04d}", t) for i, t in DOCS[:40]]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    got = {r["seq_id"]: r["tokens"] for r in
           pack.pack_sequences(df, 100).collect()}
    stream = [x for _id, t in sorted(docs) for x in t]
    assert got == {w: stream[w * 100:(w + 1) * 100]
                   for w in range((len(stream) + 99) // 100)}


def test_string_id_offsets_bucketed_matches_windowed(spark):
    """String ids take the DISTRIBUTED two-phase prefix sum (r5): results
    equal the global-window fallback on an adversarial id set — shared
    long prefixes (projection collisions land in one bucket where the
    exact string sort decides), multibyte UTF-8, and length-prefix pairs
    like 'b' vs 'aaa' that break non-padded projections."""
    rng = np.random.default_rng(5)
    ids = ([f"prefix-shared-very-long-{i:03d}" for i in range(40)]
           + ["b", "aaa", "ab", "ab0", "", "zz", "Ωmega", "αlpha",
              "日本語-doc", "é", "é"]
           + [f"doc{i}" for i in range(30)])
    docs = [(s, rng.integers(0, 999, int(n)).tolist())
            for s, n in zip(ids, rng.integers(1, 50, len(ids)))]
    df = spark.createDataFrame(docs, "doc_id string, tokens array<int>")
    meta = (df.select("doc_id", F.size("tokens").cast("long").alias("n"))
            .filter(F.col("n") > 0))
    offs = pack.doc_offsets(df, "doc_id")
    bucketed = {r["doc_id"]: r["s"] for r in offs.collect()}
    windowed = {r["doc_id"]: r["s"] for r in
                pack._windowed_offsets(meta, "doc_id").collect()}
    assert bucketed == windowed and bucketed
    # the distributed path must not contain a single-partition exchange
    plan = offs._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan


def test_string_order_surrogate_is_monotone():
    """The 56-bit prefix projection is monotone w.r.t. UTF-8 byte order
    (pure-python mirror of the SQL expression)."""
    def proj(s: str) -> int:
        h = s.encode("utf-8").hex().upper()[:14].ljust(14, "0")
        return int(h, 16)
    ids = sorted(["b", "aaa", "ab", "ab0", "", "zz", "Ωmega", "αlpha",
                  "日本語", "é", "é", "doc-1", "doc-10", "doc-2"],
                 key=lambda s: s.encode("utf-8"))
    ps = [proj(s) for s in ids]
    assert ps == sorted(ps)


def test_n_col_equals_derived_size(spark):
    # n_col keeps a derived tokens expression off the metadata scans;
    # output must be identical to the size(tokens) default
    df = (_docs_df(spark, DOCS)
          .withColumn("n_pre", F.size("tokens")))
    a = {r["seq_id"]: r["tokens"] for r in
         pack.pack_sequences(df, 77).collect()}
    b = {r["seq_id"]: r["tokens"] for r in
         pack.pack_sequences(df, 77, n_col="n_pre").collect()}
    assert a == b and a


def test_pack_giant_doc_among_tiny(spark):
    # extreme length skew: one 50k-token doc among 2-token docs. Windows
    # must stay exact (the giant doc spans ~500 windows), and no stage
    # depends on per-doc uniformity — assembly groups by window id whose
    # size is bounded by seq_len regardless of doc length.
    docs = [(i, [i % 7, (i * 3) % 7]) for i in range(200)]
    docs.append((100_000, list(range(50_000))))
    df = spark.createDataFrame(docs, "doc_id long, tokens array<int>")
    got = {r["seq_id"]: r["tokens"] for r in
           pack.pack_sequences(df, 101, parts=8).collect()}
    stream = [x for _id, t in sorted(docs) for x in t]
    want = {w: stream[w * 101:(w + 1) * 101]
            for w in range((len(stream) + 100) // 101)}
    assert got == want


def _local_chunks(docs, L, S, min_len=1):
    """Reference: starts 0, S, 2S, ... up to the first start with
    start + L >= n; slice [s, s+L)."""
    out = {}
    for _id, toks in docs:
        n = len(toks)
        last = (max(n - L, 0) + S - 1) // S
        for c in range(last + 1):
            ch = toks[c * S:c * S + L]
            if len(ch) >= min_len:
                out[(_id, c)] = ch
    return out


@pytest.mark.parametrize("L,S", [(128, 96), (7, 7), (16, 3), (1, 1)])
def test_chunk_with_overlap_matches_local_reference(spark, L, S):
    got = {(r["doc_id"], r["chunk_id"]): r["chunk"] for r in
           pack.chunk_with_overlap(_docs_df(spark, DOCS), L, S)
           .collect()}
    want = _local_chunks(DOCS, L, S)
    assert got == want


def test_chunk_with_overlap_full_windows_only(spark):
    rows = pack.chunk_with_overlap(_docs_df(spark, DOCS), 64, 32,
                                   min_len=64).collect()
    assert rows and all(r["n_tok"] == 64 for r in rows)
    want = {k: v for k, v in _local_chunks(DOCS, 64, 32).items()
            if len(v) == 64}
    assert {(r["doc_id"], r["chunk_id"]) for r in rows} == set(want)


def test_chunk_with_overlap_covers_every_token(spark):
    # union of a doc's chunks == the doc's tokens (order-preserving on
    # the stride grid): reconstruct from stride-aligned prefixes
    L, S = 50, 30
    rows = pack.chunk_with_overlap(_docs_df(spark, DOCS), L, S).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_id"]] = r["chunk"]
    for _id, toks in DOCS:
        if not toks:
            assert _id not in by_doc
            continue
        rec = []
        for c in sorted(by_doc[_id]):
            rec[c * S:] = by_doc[_id][c]
        assert rec == toks


def test_chunk_with_overlap_rejects_gapping_stride(spark):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="skip tokens"):
        pack.chunk_with_overlap(_docs_df(spark, DOCS), 16, 17)


@pytest.mark.parametrize("L", [17, 256])
def test_pack_boundaries_spans(spark, L):
    """doc_spans reconstruct the window exactly: spans tile [0, n_tok)
    in order, each span's tokens equal the source doc's slice, and doc
    order within a window follows global offsets."""
    rows = pack.pack_sequences(_docs_df(spark, DOCS), L,
                               boundaries=True).collect()
    docs = dict(DOCS)
    want = _local_pack(DOCS, L)
    assert {r["seq_id"] for r in rows} == set(want)
    for r in rows:
        assert r["tokens"] == want[r["seq_id"]]
        pos = 0
        for sp in r["doc_spans"]:
            assert sp["start"] == pos
            pos += sp["len"]
            # span content == the matching slice of the source doc
            src = docs[sp["id"]]
            got = r["tokens"][sp["start"]:sp["start"] + sp["len"]]
            found = any(src[o:o + sp["len"]] == got
                        for o in range(len(src) - sp["len"] + 1))
            assert found
        assert pos == r["n_tok"]


def test_chunk_plan_is_map_only(spark):
    # chunking must stay one embarrassingly parallel scan: no shuffle,
    # no Python eval — the 100 TB shape claimed in the docstring
    plan = (pack.chunk_with_overlap(_docs_df(spark, DOCS), 128, 96)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan
