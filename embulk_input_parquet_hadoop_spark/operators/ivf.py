"""IVF (inverted-file) approximate nearest neighbour over embeddings.

The FAISS-style scale path, Spark-first: centroids are trained driver-side
on a *bounded deterministic sample* (spherical k-means — the standard
practice for IVF at any corpus size; the full corpus is never collected),
assignment is one numpy matmul per Arrow batch inside ``mapInArrow``, and
search probes only the ``nprobe`` nearest centroid buckets, brute-forcing
cosine inside them with the same JVM-side expressions the exact path uses.

Complements the data-independent SRP-LSH bucketing
(``similarity.srp_*``): IVF adapts its partitions to the data
distribution, so probe lists stay balanced on clustered corpora where a
fixed hyperplane family would overload a few buckets.

At 10^12 vectors: training reads a ~4k-row sample (driver, O(sample));
assignment is a full scan with no shuffle (map-only); search shuffles only
the candidate bucket rows (an equi-join on centroid id). Recall/exactness
contract: probing every centroid (``nprobe = n_centroids``) reproduces the
exact top-k bit-for-bit (tested), and partial probes trade recall for the
fraction of the corpus scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dot, _fixed_matrix, _norm


def _unit_rows(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1)
    n[n == 0] = 1.0
    return V / n[:, None]


def train_centroids(emb: DataFrame, n_centroids: int = 16,
                    n_iters: int = 8, sample: int = 4096,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> np.ndarray:
    """Spherical k-means on a deterministic hash-ordered sample.

    Deterministic end to end: the sample is the first ``sample`` rows by
    ``xxhash64(id)`` order, init is the first ``n_centroids`` of those,
    Lloyd iterations are pure numpy. Returns unit centroids
    (n_centroids, dim) float64.
    """
    rows = (emb.select(id_col, vec_col)
            .orderBy(F.xxhash64(F.col(id_col).cast("string")), id_col)
            .limit(sample).collect())
    if len(rows) < n_centroids:
        raise ValueError(f"sample ({len(rows)}) < n_centroids")
    U = _unit_rows(np.array([r[1] for r in rows], dtype=np.float64))
    C = U[:n_centroids].copy()
    for _ in range(n_iters):
        assign = (U @ C.T).argmax(axis=1)
        C_new = np.zeros_like(C)
        np.add.at(C_new, assign, U)
        counts = np.bincount(assign, minlength=n_centroids)
        empty = counts == 0
        C_new[empty] = C[empty]  # keep dead centroids where they were
        C = _unit_rows(C_new)
    return C


def ivf_assign(emb: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """(id, centroid) assignment — one matmul+argmax per Arrow batch, no
    shuffle, no per-row Python."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def kernel(batches):
        for b in batches:
            V = _unit_rows(_fixed_matrix(b.column(vec_col))
                           .astype(np.float64))
            a = (V @ C.T).argmax(axis=1)
            yield pa.RecordBatch.from_arrays(
                [b.column(id_col).cast(pa.int64()),
                 pa.array(a.astype(np.int64))],
                names=[id_col, "centroid"])

    return emb.select(id_col, vec_col).mapInArrow(
        kernel, f"{id_col} bigint, centroid bigint")


def ivf_topk(emb: DataFrame, query_id: int, k: int = 20,
             n_centroids: int = 16, nprobe: int = 4, n_iters: int = 8,
             sample: int = 4096, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Approximate cosine top-k: scan only the ``nprobe`` buckets nearest
    the query. ``nprobe == n_centroids`` degenerates to the exact scan
    (same result as ``similarity.cosine_topk``, bit-for-bit)."""
    C = train_centroids(emb, n_centroids, n_iters, sample, id_col, vec_col)
    qrow = emb.filter(F.col(id_col) == query_id).select(vec_col).head()
    if qrow is None:
        raise ValueError(f"query id {query_id} not found")
    qv = _unit_rows(np.array([qrow[0]], dtype=np.float64))[0]
    probe = np.argsort(-(C @ qv))[:nprobe]
    cand_ids = (ivf_assign(emb, C, id_col, vec_col)
                .filter(F.col("centroid").isin([int(p) for p in probe]))
                .select(id_col))
    cand = emb.join(cand_ids, id_col)
    q = emb.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("_qvec"))
    denom = _norm(F.col(vec_col)) * _norm(F.col("_qvec"))
    cos = F.when(denom != 0.0,
                 _dot(F.col(vec_col), F.col("_qvec")) / denom) \
        .otherwise(F.lit(0.0))
    scored = (cand.crossJoin(F.broadcast(q))
              .filter(F.col(id_col) != query_id)
              .select(F.col(id_col), F.round(cos, 4).alias("cos_sim")))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)
