"""Deterministic mixture weighting: per-source epoch repetition."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import mixture


def _expected_copies(doc_id: int, w: float, seed: int = 0) -> int:
    full = int(w)
    frac_thresh = int((w - full) * (1 << 60))
    h = int(hashlib.md5(f"mix:{seed}:{doc_id}".encode())
            .hexdigest()[:15], 16)
    return full + (1 if h < frac_thresh else 0)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, ["web", "books", "code"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_matches_local_hash(spark, docs):
    w = {"web": 0.4, "books": 2.6, "code": 1.0}
    out = mixture.mixture_sample(docs, w).collect()
    got: dict[int, int] = {}
    for r in out:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + 1
    for i in range(300):
        exp = _expected_copies(i, w[["web", "books", "code"][i % 3]])
        assert got.get(i, 0) == exp, i
    # epochs are 1..n_copies per doc, no gaps or dups
    epochs: dict[int, set] = {}
    for r in out:
        epochs.setdefault(r["doc_id"], set()).add(r["epoch"])
    for i, es in epochs.items():
        assert es == set(range(1, got[i] + 1))


def test_mixture_drops_zero_and_missing_sources(spark, docs):
    out = mixture.mixture_sample(docs, {"web": 0.0, "books": 1.0})
    srcs = {r["source"] for r in out.select("source").distinct().collect()}
    assert srcs == {"books"}


def test_mixture_deterministic_across_partitionings(spark, docs):
    w = {"web": 1.3, "books": 0.7, "code": 2.0}
    a = sorted((r["doc_id"], r["epoch"]) for r in
               mixture.mixture_sample(docs, w).collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in
               mixture.mixture_sample(docs.repartition(7), w).collect())
    assert a == b


def test_mixture_rejects_negative_weight(spark, docs):
    with pytest.raises(ValueError):
        mixture.mixture_sample(docs, {"web": -0.1})
