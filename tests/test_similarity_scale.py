"""SRP near-dup scale hardening: bounded per-bucket memory (blocked
pairwise matmul) and a quantitative recall gate against the exact oracle.

VERDICT r1 #8/#9: a mega-bucket must not OOM ``np.triu_indices``, and the
bucketed path needs a measured correctness signal, not rows-only.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.001"


def test_single_mega_bucket_bounded_blocks(spark):
    """Adversarial corpus: every vector identical -> one SRP bucket. The
    blocked kernel must still produce every pair with block_rows far
    smaller than the bucket."""
    n = 300
    rows = [(i, [1.0, 2.0, -0.5, 3.0]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = similarity.srp_neardup_pairs(emb, threshold=0.99, n_planes=4,
                                         block_rows=32)
    assert pairs.count() == n * (n - 1) // 2


def test_blocked_equals_unblocked(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    small = {(r.id_a, r.id_b) for r in similarity.srp_neardup_pairs(
        emb, threshold=0.3, n_planes=2, block_rows=16).collect()}
    large = {(r.id_a, r.id_b) for r in similarity.srp_neardup_pairs(
        emb, threshold=0.3, n_planes=2, block_rows=100_000).collect()}
    assert small == large and len(small) > 0


def test_srp_recall_and_precision_vs_exact(spark):
    """Gate the bucketed path against the q24 exact oracle subset:
    precision must be 1.0 (within-bucket cosines are exact) and recall
    must sit near the LSH collision probability E[(1 - theta/pi)^k]."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").filter(
        F.col("vec_id") % 3 == 0)
    exact = {(r.id_a, r.id_b): r.cos_sim
             for r in similarity.neardup_pairs(emb, threshold=0.3).collect()}
    assert len(exact) > 50
    for planes in (2, 4):
        got = {(r.id_a, r.id_b) for r in similarity.srp_neardup_pairs(
            emb, threshold=0.3, n_planes=planes).collect()}
        assert got <= set(exact), "bucketed path emitted a non-pair"
        recall = len(got & set(exact)) / len(exact)
        expected = float(np.mean([
            (1 - math.acos(min(1.0, max(-1.0, c))) / math.pi) ** planes
            for c in exact.values()]))
        # deterministic data+planes; allow slack below theory, forbid
        # collapse (measured r1: 0.367 vs 0.371 @2p, 0.156 vs 0.138 @4p)
        assert recall >= 0.6 * expected, (planes, recall, expected)
