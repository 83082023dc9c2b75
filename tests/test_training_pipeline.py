"""End-to-end training-data pipeline: mixture -> pack -> encode -> verify.

The composition the operators exist for: weight sources into a mixture,
pack the id-ordered epoch stream into fixed windows, encode the packed
windows with the columnar engine, and prove the decode is bit-identical.
Every stage is deterministic (md5 mixture, integer prefix-sum packing,
framed codecs), so the whole pipeline is reproducible end to end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import mixture, pack
from embulk_input_parquet_hadoop_spark.plans import pipeline, verify

SEQ_LEN = 128
WEIGHTS = {"web": 1.4, "books": 2.0}
MAX_E = 4  # > max possible epochs, for the surrogate key


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(4242)
    rows = [(int(i), rng.integers(0, 50257, int(n)).tolist(),
             ["web", "books"][i % 2])
            for i, n in enumerate(rng.integers(10, 300, 150))]
    return spark.createDataFrame(
        rows, "doc_id long, tokens array<int>, source string")


def test_mixture_pack_encode_roundtrip(spark, corpus, tmp_path):
    mixed = mixture.mixture_sample(corpus, WEIGHTS)
    # packing needs a unique order key; one row per (doc, epoch)
    keyed = mixed.select(
        (F.col("doc_id") * MAX_E + F.col("epoch")).alias("seq_key"),
        "tokens")
    packed = pack.pack_sequences(keyed, SEQ_LEN, id_col="seq_key",
                                 drop_last=True)

    # local reference: same mixture (md5), same order, same cut
    docs = {r["doc_id"]: (r["tokens"], r["source"])
            for r in corpus.collect()}
    stream: list[int] = []
    entries = []
    for i, (toks, src) in docs.items():
        w = WEIGHTS[src]
        full = int(w)
        thresh = int((w - full) * (1 << 60))
        h = int(hashlib.md5(f"mix:0:{i}".encode()).hexdigest()[:15], 16)
        for e in range(1, full + (1 if h < thresh else 0) + 1):
            entries.append((i * MAX_E + e, toks))
    for _, toks in sorted(entries):
        stream.extend(toks)
    want = {w: stream[w * SEQ_LEN:(w + 1) * SEQ_LEN]
            for w in range(len(stream) // SEQ_LEN)}
    got = {r["seq_id"]: r["tokens"] for r in packed.collect()}
    assert got == want

    # encode the packed windows, decode, prove bit-identity
    src_dir = str(tmp_path / "packed")
    out_dir = str(tmp_path / "encoded")
    (packed.select(F.col("seq_id").cast("string").alias("doc_id"),
                   "tokens", F.col("n_tok").cast("int").alias("n_tok"),
                   F.lit("packed").alias("source"))
     .coalesce(2).write.parquet(src_dir))
    pipeline.encode_path(spark, src_dir, out_dir)
    res = verify.verify_path(spark, src_dir, out_dir)
    assert res["ok"] and res["rows_compared"] == len(want)


def test_clean_decontaminate_split_front_half(spark):
    """The cleaning front half the round-3 operators add: quality filter
    -> benchmark decontamination (anti-join) -> deterministic split.
    Every stage is a pure function of the row, so the surviving set is
    exactly predictable."""
    from embulk_input_parquet_hadoop_spark.operators import (dedup,
                                                             textstats)
    uniq = [f"w{j}" for j in range(40)]
    good = " ".join(["the"] + uniq[:29])
    docs = [(1, good, "web"),
            (2, "the and", "web"),                   # too_short
            (3, " ".join(["the"] * 30), "books"),    # repetitive
            (4, good + " extra trailing words here", "books"),  # kept
            (5, good, "books")]                      # dup of benchmark
    df = spark.createDataFrame(docs,
                               "doc_id bigint, text string, source string")
    bench = spark.createDataFrame([(900, good, "eval")],
                                  "doc_id bigint, text string, source string")

    kept = textstats.filter_corpus(
        df, min_words=25, max_words=90, langs=("en",),
        max_dup_word_frac=0.70, min_distinct_ratio=0.45
    ).filter(F.col("keep"))
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5}

    flagged = dedup.contaminated_ids(kept, bench, "doc_id", "text", k=5)
    clean = kept.join(flagged, "doc_id", "left_anti")
    # docs 1 and 5 equal the benchmark text -> removed; 4 extends it ->
    # shares its 5-gram shingles -> also removed; nothing survives by
    # accident
    assert {r.doc_id for r in clean.collect()} == set()

    # with a disjoint benchmark everything kept survives and splits
    bench2 = spark.createDataFrame(
        [(901, " ".join(f"z{j}" for j in range(30)), "eval")],
        "doc_id bigint, text string, source string")
    clean2 = kept.join(
        dedup.contaminated_ids(kept, bench2, "doc_id", "text", k=5),
        "doc_id", "left_anti")
    lab = mixture.split_assign(clean2, {"train": 0.5, "test": 0.5})
    rows = {r.doc_id: r.split for r in lab.collect()}
    assert set(rows) == {1, 4, 5}
    assert set(rows.values()) <= {"train", "test"}
