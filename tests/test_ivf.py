"""IVF ANN: full-probe exactness, partial-probe recall, determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import ivf, similarity

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_full_probe_equals_exact_topk(spark):
    """Probing every centroid must reproduce the exact scan bit-for-bit —
    the strongest correctness signal an ANN index can give."""
    emb = _emb(spark)
    exact = [(r.vec_id, r.cos_sim) for r in
             similarity.cosine_topk(emb, query_id=0, k=20).collect()]
    full = [(r.vec_id, r.cos_sim) for r in
            ivf.ivf_topk(emb, query_id=0, k=20, n_centroids=8,
                         nprobe=8).collect()]
    assert full == exact


def test_partial_probe_recall(spark):
    emb = _emb(spark)
    exact = {r.vec_id for r in
             similarity.cosine_topk(emb, query_id=0, k=20).collect()}
    got = {r.vec_id for r in
           ivf.ivf_topk(emb, query_id=0, k=20, n_centroids=8,
                        nprobe=4).collect()}
    recall = len(got & exact) / len(exact)
    # half the buckets probed, query-nearest first: recall well above the
    # corpus fraction scanned (deterministic data + training)
    assert recall >= 0.5, recall


def test_training_and_assignment_deterministic(spark):
    emb = _emb(spark)
    c1 = ivf.train_centroids(emb, n_centroids=8)
    c2 = ivf.train_centroids(emb, n_centroids=8)
    assert np.array_equal(c1, c2)
    a1 = {(r.vec_id, r.centroid)
          for r in ivf.ivf_assign(emb, c1).collect()}
    a2 = {(r.vec_id, r.centroid)
          for r in ivf.ivf_assign(emb, c2).collect()}
    assert a1 == a2
    # every vector lands in exactly one bucket
    assert len(a1) == emb.count()


def test_build_once_search_many(spark, tmp_path, monkeypatch):
    """VERDICT r2 #3: the index is built ONCE (train + assign + partitioned
    write); every subsequent search reuses it — proven by poisoning
    train_centroids after the build and searching twice anyway. Results
    must match the one-shot wrapper's."""
    emb = _emb(spark)
    expected0 = [(r.vec_id, r.cos_sim) for r in
                 ivf.ivf_topk(emb, query_id=0, k=10, n_centroids=8,
                              nprobe=8).collect()]
    index = ivf.ivf_build(emb, n_centroids=8,
                          out_path=str(tmp_path / "ivf_idx"))

    def boom(*a, **k):
        raise AssertionError("search must not retrain")
    monkeypatch.setattr(ivf, "train_centroids", boom)

    q0 = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    got0 = [(r.vec_id, r.cos_sim) for r in
            ivf.ivf_search(index, np.array(q0), k=10, nprobe=8,
                           exclude_id=0).collect()]
    assert got0 == expected0
    q5 = emb.filter(F.col("vec_id") == 5).select("embedding").head()[0]
    got5 = ivf.ivf_search(index, np.array(q5), k=10, nprobe=8,
                          exclude_id=5).collect()
    assert len(got5) == 10 and got5[0].cos_sim >= got5[-1].cos_sim


def test_search_prunes_partitions(spark, tmp_path):
    """An on-disk index search must read only the probed buckets: the scan
    carries a PartitionFilters entry on `centroid`, so pruning happens at
    file-listing time, not per row."""
    emb = _emb(spark)
    index = ivf.ivf_build(emb, n_centroids=8,
                          out_path=str(tmp_path / "ivf_idx2"))
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    res = ivf.ivf_search(index, np.array(q), k=5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid" in plan, plan
    assert res.count() == 5


def test_load_reopens_index(spark, tmp_path):
    emb = _emb(spark)
    path = str(tmp_path / "ivf_idx3")
    built = ivf.ivf_build(emb, n_centroids=8, out_path=path)
    loaded = ivf.ivf_load(spark, path)
    assert np.array_equal(built.centroids, loaded.centroids)
    q = emb.filter(F.col("vec_id") == 3).select("embedding").head()[0]
    a = ivf.ivf_search(built, np.array(q), k=8, nprobe=3).collect()
    b = ivf.ivf_search(loaded, np.array(q), k=8, nprobe=3).collect()
    assert [(r.vec_id, r.cos_sim) for r in a] == \
        [(r.vec_id, r.cos_sim) for r in b]


def test_search_many_matches_per_query_search(spark, tmp_path):
    """Batched search == per-query search, query by query, at full probe
    AND at partial probe (same index, same kernel semantics)."""
    emb = _emb(spark)
    index = ivf.ivf_build(emb, n_centroids=8,
                          out_path=str(tmp_path / "ivf_many"))
    qids = [0, 5, 11]
    qrows = {r.vec_id: list(r.embedding) for r in
             emb.filter(F.col("vec_id").isin(qids)).collect()}
    queries = spark.createDataFrame(
        [(qid, qrows[qid]) for qid in qids],
        "query_id bigint, qvec array<float>")
    for nprobe in (8, 3):
        many = ivf.ivf_search_many(index, queries, k=10, nprobe=nprobe)
        got = {}
        for r in many.collect():
            got.setdefault(r.query_id, []).append((r.vec_id, r.cos_sim))
        for qid in got:
            got[qid].sort(key=lambda t: (-t[1], t[0]))
        for qid in qids:
            single = [(r.vec_id, r.cos_sim) for r in
                      ivf.ivf_search(index, np.array(qrows[qid]), k=10,
                                     nprobe=nprobe).collect()]
            assert got[qid] == single, (nprobe, qid)


def test_sq8_rescore_all_equals_float_search(spark):
    """With a rescore pool covering every candidate, SQ8 search must be
    bit-identical to the float search at the same probes — quantization
    then only reorders candidate generation, which full rescoring
    neutralizes."""
    emb = _emb(spark)
    n = emb.count()
    index = ivf.ivf_build(emb, n_centroids=8, sq8=True)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    for nprobe in (8, 3):
        want = [(r.vec_id, r.cos_sim) for r in
                ivf.ivf_search(index, np.array(q), k=10, nprobe=nprobe,
                               exclude_id=0).collect()]
        got = [(r.vec_id, r.cos_sim) for r in
               ivf.ivf_search_sq(index, np.array(q), k=10, nprobe=nprobe,
                                 rescore=n, exclude_id=0).collect()]
        assert got == want, nprobe


def test_sq8_default_rescore_recall_and_exact_scores(spark):
    """Default rescore=4: high recall vs the float search, and every
    returned score must equal the exact cosine for that id (scores come
    from the float vectors, never the quantized ones)."""
    emb = _emb(spark)
    index = ivf.ivf_build(emb, n_centroids=8, sq8=True)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    want = {r.vec_id: r.cos_sim for r in
            ivf.ivf_search(index, np.array(q), k=20, nprobe=8,
                           exclude_id=0).collect()}
    got = {r.vec_id: r.cos_sim for r in
           ivf.ivf_search_sq(index, np.array(q), k=20, nprobe=8,
                             rescore=4, exclude_id=0).collect()}
    recall = len(set(got) & set(want)) / len(want)
    assert recall >= 0.8, recall
    for vid, cs in got.items():
        if vid in want:
            assert cs == want[vid], vid


def test_sq8_disk_posting_lists_smaller(spark, tmp_path):
    """The point of SQ8: the quantized posting lists a probe scans are a
    fraction of the float lists' bytes, and a loaded index searches them
    partition-pruned."""
    import pathlib
    emb = _emb(spark)
    path = str(tmp_path / "ivf_sq8")
    ivf.ivf_build(emb, n_centroids=8, out_path=path, sq8=True)
    loaded = ivf.ivf_load(spark, path)
    assert loaded.qvectors is not None

    def tree_bytes(p):
        return sum(f.stat().st_size
                   for f in pathlib.Path(p).rglob("*.parquet"))
    qb, vb = tree_bytes(f"{path}/qvectors"), tree_bytes(f"{path}/vectors")
    assert qb < 0.6 * vb, (qb, vb)
    q = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    res = ivf.ivf_search_sq(loaded, np.array(q), k=5, nprobe=2)
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid" in plan
    assert res.count() == 5


def test_assignment_balance(spark):
    """IVF's selling point over fixed hyperplanes: adapted buckets stay
    populated — no centroid owns the whole corpus."""
    emb = _emb(spark)
    c = ivf.train_centroids(emb, n_centroids=8)
    sizes = (ivf.ivf_assign(emb, c).groupBy("centroid")
             .agg(F.count(F.lit(1)).alias("n")).collect())
    counts = [r.n for r in sizes]
    assert len(counts) >= 4  # most buckets in use
    assert max(counts) < 0.8 * sum(counts)
