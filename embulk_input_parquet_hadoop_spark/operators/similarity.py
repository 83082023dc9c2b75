"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline (a single broadcast of the
query vector + one JVM-side pass — no shuffle until the final top-k), and an
LSH-bucketed variant (sign-random-projection buckets) as the scale path: at
10^9+ vectors, bucket first, then brute-force within buckets.

Dot products use ``F.zip_with`` + ``F.aggregate`` over doubles — built-in
higher-order functions, no Python UDF, sequential left-to-right summation
(reproducible in the DuckDB oracle with list_dot_product on DOUBLE[]).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y:
                   x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_topk(emb: DataFrame, query_id: int, k: int = 20,
                id_col: str = "vec_id", vec_col: str = "embedding"
                ) -> DataFrame:
    """Exact top-k by cosine similarity to the vector with ``query_id``.

    The 1-row query side is broadcast (crossJoin with a broadcast hint), so
    the scan side never shuffles; the top-k is a single global sort-limit
    which AQE executes as partial top-k per partition + merge.
    """
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"))
    scored = (emb.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != query_id)
              .select(
                  F.col(id_col),
                  F.round(_dot(F.col(vec_col), F.col("_qvec"))
                          / (_norm(F.col(vec_col)) * _norm(F.col("_qvec"))),
                          4).alias("cos_sim")))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def knn_label_histogram(emb: DataFrame, query_id: int, k: int = 50,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        label_col: str = "label") -> DataFrame:
    """Labels of the k nearest neighbors — the classifier-style readout."""
    top = cosine_topk(emb, query_id, k, id_col, vec_col)
    return (top.join(emb.select(id_col, label_col), id_col)
            .groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col(label_col), F.col("n")))


def srp_bucket(emb: DataFrame, n_planes: int = 8, seed: int = 7,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """Sign-random-projection LSH buckets (deterministic pseudo-planes).

    Plane p's component j is derived arithmetically from (p, j, seed) so the
    bucketing is reproducible anywhere (no stored model):
    c(p,j) = fract(sin(p*12.9898 + j*78.233 + seed) * 43758.5453) - 0.5 —
    the classic shader-noise construction; deterministic IEEE-754 double ops.
    At scale: group by bucket, brute-force within buckets only.
    """
    dim = len(emb.select(vec_col).head()[0])
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        comps = [
            (F.element_at(F.col(vec_col), j + 1).cast("double")
             * _noise(p, j, seed)) for j in range(dim)]
        dot = comps[0]
        for c in comps[1:]:
            dot = dot + c
        bucket = bucket + F.when(dot > 0,
                                 F.lit(1 << p).cast("long")).otherwise(0)
    return emb.select(F.col(id_col), bucket.alias("bucket"))


def _noise(p: int, j: int, seed: int) -> Column:
    x = p * 12.9898 + j * 78.233 + seed
    s = F.sin(F.lit(x)) * 43758.5453
    return (s - F.floor(s)) - 0.5


def srp_bucket_sizes(emb: DataFrame, n_planes: int = 8, seed: int = 7,
                     id_col: str = "vec_id", vec_col: str = "embedding"
                     ) -> DataFrame:
    return (srp_bucket(emb, n_planes, seed, id_col, vec_col)
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"),
                                   F.min(id_col).alias("min_id")))


def neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                  id_col: str = "vec_id", vec_col: str = "embedding"
                  ) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, pairwise).

    The O(n^2) baseline for near-dup mining: self-join on id_a < id_b,
    rounded cosine >= threshold. At corpus scale the same comparison runs
    *within* SRP buckets (:func:`srp_neardup_pairs`) so the join is
    bucket-local instead of all-pairs.
    """
    a = emb.select(F.col(id_col).alias("id_a"),
                   F.col(vec_col).alias("vec_a"))
    b = emb.select(F.col(id_col).alias("id_b"),
                   F.col(vec_col).alias("vec_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.round(_dot(F.col("vec_a"), F.col("vec_b"))
                  / (_norm(F.col("vec_a")) * _norm(F.col("vec_b"))), 4)
    return (pairs.select("id_a", "id_b", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))


def srp_neardup_pairs(emb: DataFrame, threshold: float = 0.95,
                      n_planes: int = 8, seed: int = 7,
                      id_col: str = "vec_id", vec_col: str = "embedding"
                      ) -> DataFrame:
    """Bucketed near-dup mining — the scale path.

    Candidate pairs come only from equal SRP buckets (equi-join on bucket:
    a shuffle-partitionable join instead of an all-pairs cross join), then
    the exact cosine filter verifies. Recall < 1 by construction (pairs
    split across buckets are missed) — that is the standard LSH trade; raise
    recall with fewer planes or multiple plane-sets.
    """
    with_bucket = emb.join(srp_bucket(emb, n_planes, seed, id_col, vec_col),
                           id_col)
    a = with_bucket.select(F.col(id_col).alias("id_a"),
                           F.col(vec_col).alias("vec_a"), "bucket")
    b = with_bucket.select(F.col(id_col).alias("id_b"),
                           F.col(vec_col).alias("vec_b"),
                           F.col("bucket").alias("bucket_b"))
    pairs = a.join(b, (F.col("bucket") == F.col("bucket_b"))
                   & (F.col("id_a") < F.col("id_b")))
    cos = F.round(_dot(F.col("vec_a"), F.col("vec_b"))
                  / (_norm(F.col("vec_a")) * _norm(F.col("vec_b"))), 4)
    return (pairs.select("id_a", "id_b", "bucket", cos.alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))
