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


def _expected_split(doc_id: int, fractions: dict[str, float],
                    seed: int = 0) -> str:
    names = list(fractions)
    ts = mixture.split_thresholds(fractions)
    h = int(hashlib.md5(f"split:{seed}:{doc_id}".encode())
            .hexdigest()[:15], 16)
    for s, t in zip(names[:-1], ts):
        if h < t:
            return s
    return names[-1]


def test_split_assign_matches_local_hash(spark, docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = {r.doc_id: r.split
           for r in mixture.split_assign(docs, fr, "doc_id",
                                         seed=3).collect()}
    assert len(out) == 300  # every row labeled, none dropped
    for i in range(300):
        assert out[i] == _expected_split(i, fr, seed=3), i


def test_split_stable_under_corpus_growth(spark, docs):
    # an id keeps its split when other rows come and go — the property
    # randomSplit cannot give (its assignment depends on partition layout)
    fr = {"train": 0.5, "test": 0.5}
    full = {r.doc_id: r.split
            for r in mixture.split_assign(docs, fr).collect()}
    subset = {r.doc_id: r.split
              for r in mixture.split_assign(
                  docs.filter(F.col("doc_id") % 7 == 0), fr).collect()}
    assert subset == {i: full[i] for i in subset}


def test_split_assign_validation(spark, docs):
    with pytest.raises(ValueError):
        mixture.split_assign(docs, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError):
        mixture.split_assign(docs, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError):
        mixture.split_assign(docs, {})


def test_split_proportions_roughly_hold(spark, docs):
    fr = {"train": 0.9, "val": 0.05, "test": 0.05}
    counts = {r.split: r.n
              for r in mixture.split_assign(docs, fr).groupBy("split")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts.get("train", 0) > 240
    assert sum(counts.values()) == 300


def _local_exact_k(rows, k, seed):
    """Reference: k smallest md5(mix:seed:id) per source, rk by that order."""
    keyed = sorted(
        (int(hashlib.md5(f"mix:{seed}:{i}".encode()).hexdigest()[:15], 16),
         i, s) for i, s in rows)
    out, taken = {}, {}
    for hk, i, s in keyed:
        taken.setdefault(s, 0)
        if taken[s] < k:
            taken[s] += 1
            out[(s, i)] = taken[s]
    return out


def test_sample_exact_k_matches_local_hash(spark, docs):
    got = {(r.source, r.doc_id): r.rk
           for r in mixture.sample_exact_k(docs, 7, seed=3).collect()}
    rows = [(r.doc_id, r.source) for r in docs.collect()]
    assert got == _local_exact_k(rows, 7, 3)


def test_sample_exact_k_partition_independent(spark, docs):
    a = sorted((r.source, r.doc_id, r.rk) for r in
               mixture.sample_exact_k(docs.repartition(1), 5).collect())
    b = sorted((r.source, r.doc_id, r.rk) for r in
               mixture.sample_exact_k(docs.repartition(37), 5).collect())
    assert a == b and len(a) == 15


def test_sample_exact_k_small_group_takes_all(spark):
    rows = [(i, "tiny" if i < 3 else "big") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture.sample_exact_k(df, 10).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.rk)
    assert sorted(by_src["tiny"]) == [1, 2, 3]      # min(k, |group|)
    assert sorted(by_src["big"]) == list(range(1, 11))


def test_sample_exact_k_validation(spark, docs):
    with pytest.raises(ValueError):
        mixture.sample_exact_k(docs, 0)


def test_sample_exact_k_plan_shape(spark, docs):
    """The two-phase selection must stay map-side until the single
    window exchange: exactly one Exchange in the physical plan (the
    per-group window), the local top-k a map-only mapInPandas."""
    plan = mixture.sample_exact_k(docs, 5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_sample_exact_k_keeps_null_group(spark):
    """SQL window semantics: NULL is a group; pandas' default
    dropna=True would silently discard those rows map-side (review)."""
    rows = [(i, "a") for i in range(20)] + [(100 + i, None)
                                            for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture.sample_exact_k(df, 3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r.rk)
    assert sorted(by_src[None]) == [1, 2, 3]
    assert sorted(by_src["a"]) == [1, 2, 3]


# ---------------------------------------------------------------------
# token_budget_sample
# ---------------------------------------------------------------------

def _hk(seed, doc_id):
    return int(hashlib.md5(f"mix:{seed}:{doc_id}".encode())
               .hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def tok_docs(spark):
    rows = [(i, ["wiki", "web", "code"][i % 3], (i * 37) % 90 + 10)
            for i in range(240)]
    return spark.createDataFrame(rows,
                                 "doc_id long, source string, n_tok int")


def test_token_budget_matches_local_prefix(spark, tok_docs):
    rows = tok_docs.collect()
    budgets = {"wiki": 300, "web": 150}
    got = {r.doc_id: r.cum_tokens for r in mixture.token_budget_sample(
        tok_docs, budgets, seed=3).collect()}
    # local reference: per-source hash-ordered prefix under the budget
    want = {}
    for src, budget in budgets.items():
        cum = 0
        for r in sorted((r for r in rows if r.source == src),
                        key=lambda r: (_hk(3, r.doc_id), r.doc_id)):
            cum += r.n_tok
            if cum > budget:
                break
            want[r.doc_id] = cum
    assert got == want and want
    # sources not in budgets ("code") are dropped entirely
    kept_srcs = {r.source for r in mixture.token_budget_sample(
        tok_docs, budgets, seed=3).collect()}
    assert kept_srcs <= set(budgets)


def test_token_budget_deterministic_across_partitionings(spark, tok_docs):
    budgets = {"wiki": 250, "web": 999999}
    a = sorted(r.doc_id for r in mixture.token_budget_sample(
        tok_docs, budgets, seed=5).collect())
    b = sorted(r.doc_id for r in mixture.token_budget_sample(
        tok_docs.repartition(7, "doc_id"), budgets,
        seed=5).collect())
    assert a == b
    # an over-large budget keeps the whole source
    n_web = tok_docs.filter("source = 'web'").count()
    assert sum(1 for r in mixture.token_budget_sample(
        tok_docs, budgets, seed=5).collect()
        if r.source == "web") == n_web


def test_token_budget_guards(spark, tok_docs):
    with pytest.raises(ValueError, match="empty"):
        mixture.token_budget_sample(tok_docs, {})
    with pytest.raises(ValueError, match="negative"):
        mixture.token_budget_sample(tok_docs, {"wiki": -1})
    with pytest.raises(ValueError, match="cum_tokens"):
        mixture.token_budget_sample(
            tok_docs.withColumn("cum_tokens", F.lit(1)), {"wiki": 10})


def test_token_budget_rejects_null_and_negative_counts(spark):
    from pyspark.sql.utils import PythonException
    import py4j
    bad = spark.createDataFrame(
        [(1, "wiki", 5), (2, "wiki", None)],
        "doc_id long, source string, n_tok int")
    with pytest.raises(Exception, match="non-null"):
        mixture.token_budget_sample(bad, {"wiki": 100}).collect()
    neg = spark.createDataFrame(
        [(1, "wiki", 5), (2, "wiki", -3)],
        "doc_id long, source string, n_tok int")
    with pytest.raises(Exception, match="non-null"):
        mixture.token_budget_sample(neg, {"wiki": 100}).collect()


def test_shuffle_shards_is_a_dense_deterministic_permutation(spark):
    df = spark.createDataFrame([(i, i * 10) for i in range(400)],
                               "doc_id long, n_chars long")
    out = mixture.shuffle_shards(df, "doc_id", n_shards=8, seed=3)
    rows = out.select("doc_id", "shard", "pos").collect()
    # every input id exactly once, shards in range
    assert sorted(r.doc_id for r in rows) == list(range(400))
    assert all(0 <= r.shard < 8 for r in rows)
    # positions dense 0..n-1 within each shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(len(ps)))
    # balanced in expectation: no shard dominates (md5 uniformity)
    sizes = [len(v) for v in by_shard.values()]
    assert len(sizes) == 8 and max(sizes) < 2.5 * min(sizes)
    # partitioning-independent: identical assignment after repartition
    again = (mixture.shuffle_shards(df.repartition(13), "doc_id",
                                    n_shards=8, seed=3)
             .select("doc_id", "shard", "pos").collect())
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a different seed is a different permutation
    other = (mixture.shuffle_shards(df, "doc_id", n_shards=8, seed=4)
             .select("doc_id", "shard", "pos").collect())
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_shuffle_shards_rejects_bad_n_shards(spark):
    df = spark.createDataFrame([(1, 1)], "doc_id long, n_chars long")
    with pytest.raises(ValueError, match="n_shards"):
        mixture.shuffle_shards(df, "doc_id", n_shards=0)
    with pytest.raises(ValueError, match="n_shards"):
        mixture.shuffle_shards(df, "doc_id", n_shards=-4)
