"""n-gram Jaccard: document-frequency cap + non-empty result guarantee.

VERDICT r1 "What's wrong" #2: the q12 surface returned 0 rows at sf0.001
(proving only the empty case) and the inverted-index self-join had no
hot-shingle cap. These tests pin both fixes.
"""

import pytest

from embulk_input_parquet_hadoop_spark.operators import dedup


def test_ngram_jaccard_max_df_cap(spark):
    # 12 docs share boilerplate shingles; docs 100/101 are true near-dups
    docs = [(i, f"lorem ipsum dolor unique{i} a b c d") for i in range(12)]
    docs += [(100, "x y z w q r s t u v"),
             (101, "x y z w q r s t u v zz")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    uncapped = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.01).collect()}
    capped = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard_pairs(
        df, "doc_id", "text", k=3, threshold=0.01, max_df=10).collect()}
    # hot shingles (df=12 > 10) no longer generate candidate pairs...
    assert all(a >= 100 for a, _ in capped), capped
    # ...but the genuine near-dup pair survives the cap
    assert (100, 101) in capped
    assert len(uncapped) > len(capped)


def test_ngram_jaccard_threshold_filters(spark):
    docs = [(1, "a b c d e f"), (2, "a b c d e g"), (3, "q r s t u v")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3,
                                     threshold=0.3).collect()
    # docs 1,2 share 3 of 4 shingles -> jaccard 3/5; doc 3 shares none
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}
    assert abs(rows[0].jaccard - 0.6) < 1e-9


def test_q12_emits_rows_at_smallest_sf(spark):
    # the driver gate runs q12 at sf0.01; a 0-row pass proves only the
    # empty case, so the query surface must produce pairs even at sf0.001
    import __spark_entry__ as entrymod
    n = entrymod.q12_ngram_jaccard_pairs(
        spark, "/root/testdata/sf0.001").count()
    assert n > 0


def test_ngram_jaccard_leaves_no_cached_rdds(spark):
    """VERDICT r2 #4 / ADVICE r2: the r2 implementation persisted the
    shingle set and never released it — repeated calls in a long-lived
    session accumulated cached partitions until shutdown. The window-based
    plan has no cached intermediate at all."""
    docs = [(1, "a b c d e f"), (2, "a b c d e g"), (3, "q r s t u v")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3, threshold=0.3,
                              max_df=10).collect()
    after = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert after == before, (
        f"ngram_jaccard_pairs leaked cached RDDs: {before} -> {after}")


def test_lsh_candidates_restrict_jaccard(spark):
    """candidates= computes jaccard ONLY for proposed pairs, with values
    identical to the full inverted-index run for pairs both emit — the
    LSH->verify pipeline is a recall-filtered view of the exact result."""
    docs = [(1, "a b c d e f"), (2, "a b c d e g"), (3, "q r s t u v"),
            (4, "q r s t u w")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    full = {(r.id_a, r.id_b): (r.inter, r.jaccard)
            for r in dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", k=3, threshold=0.01).collect()}
    cand = spark.createDataFrame([(1, 2)], "id_a bigint, id_b bigint")
    got = {(r.id_a, r.id_b): (r.inter, r.jaccard)
           for r in dedup.ngram_jaccard_pairs(
               df, "doc_id", "text", k=3, threshold=0.01,
               candidates=cand).collect()}
    assert set(got) == {(1, 2)}  # (3,4) not proposed -> not computed
    assert got[(1, 2)] == full[(1, 2)]


def test_lsh_candidate_pairs_max_bucket(spark):
    """Over-full buckets are dropped before pairing (the f^2/2 guard)."""
    # 10 identical docs share every bucket; 2 distinct near-dups don't
    docs = [(i, "x y z w v u t s") for i in range(10)]
    docs += [(100, "p q r s t u"), (101, "p q r s t u")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    sigs = dedup.minhash_signatures(df, "doc_id", "text", n_hashes=4)
    capped = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(
        sigs, "doc_id", rows_per_band=1, max_bucket=5).collect()}
    assert capped == {(100, 101)}
    uncapped = {(r.id_a, r.id_b) for r in dedup.lsh_candidate_pairs(
        sigs, "doc_id", rows_per_band=1).collect()}
    assert len(uncapped) == 45 + 1  # 10 choose 2 boilerplate + the pair


def test_winnow_shared_run_shares_fingerprint(spark):
    """Winnowing guarantee (MOSS): documents sharing a word run of length
    >= w+k-1 share at least one fingerprint; disjoint docs share none."""
    from embulk_input_parquet_hadoop_spark.operators import textstats
    run = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 5+4-1
    docs = [(1, f"intro words here {run} tail one"),
            (2, f"different prefix {run} other ending words"),
            (3, "completely unrelated vocabulary set with many terms")]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    fps = textstats.winnow_fingerprints(df, "doc_id", "text", k=4, w=5)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "shared run must share a fingerprint"
    assert not (by_doc[1] & by_doc.get(3, set()))
    assert not (by_doc[2] & by_doc.get(3, set()))


def test_connected_components_multi_hop(spark):
    """A path graph needs label propagation across multiple rounds
    (diameter > 1): 1-2-3-4-5 all collapse to component 1, the separate
    edge 10-11 to 10, and the convergence check must terminate."""
    from embulk_input_parquet_hadoop_spark.operators import dedup
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (4, 3), (4, 5), (10, 11)],
        "id_a long, id_b long")
    got = {r.v: r.component
           for r in dedup.connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_connected_components_empty(spark):
    from embulk_input_parquet_hadoop_spark.operators import dedup
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(edges).count() == 0


def test_connected_components_driver_vs_distributed(spark):
    """The size-gated driver union-find and the distributed loop assign
    identical components on a random graph (chains, cliques, isolated
    edges), and the default gate actually takes the driver path."""
    import numpy as np

    from embulk_input_parquet_hadoop_spark.operators import dedup
    rng = np.random.default_rng(13)
    # random sparse graph: 300 vertices, 250 edges -> mixed components
    e = rng.integers(0, 300, size=(250, 2))
    e = e[e[:, 0] != e[:, 1]]
    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in e], "id_a long, id_b long")
    fast = {r.v: r.component
            for r in dedup.connected_components(edges).collect()}
    loop = {r.v: r.component
            for r in dedup.connected_components(
                edges, driver_max_edges=0).collect()}
    assert fast == loop and fast
    # canonical representative: every component id is its own label
    for v, c in fast.items():
        assert fast[c] == c and c <= v


def test_connected_components_paths_return_identical_schema(spark):
    """The driver fast path must not leak pandas-inferred types: both
    gates return (v, component) typed as the input src column."""
    from embulk_input_parquet_hadoop_spark.operators import dedup
    edges = spark.createDataFrame([(2, 1), (3, 2)], "id_a int, id_b int")
    fast = dedup.connected_components(edges)
    loop = dedup.connected_components(edges, driver_max_edges=0)
    assert [f.dataType for f in fast.schema.fields] == \
           [f.dataType for f in loop.schema.fields]
    assert fast.schema.fieldNames() == loop.schema.fieldNames()
    assert fast.schema["v"].dataType == edges.schema["id_a"].dataType


def test_ngram_jaccard_max_pairs_guardrail(spark):
    """The exact inverted-index baseline refuses fast when the candidate
    pair count would exceed max_pairs — before the quadratic join runs."""
    from embulk_input_parquet_hadoop_spark.operators import dedup
    docs = [(i, "the same boilerplate text repeated everywhere")
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    with pytest.raises(ValueError, match="max_pairs"):
        dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3,
                                  max_pairs=100).collect()
    # same corpus under the bound (the estimate counts pre-dedup
    # per-shingle candidates, ~4*C(40,2)=3120 here): runs and finds pairs
    got = dedup.ngram_jaccard_pairs(df, "doc_id", "text", k=3,
                                    max_pairs=5000)
    assert got.count() == 40 * 39 // 2


def test_keep_canonical(spark):
    """Per-cluster keeper = max order_col, ties -> min id; unclustered
    docs pass through; exactly the non-keeper clustered docs drop."""
    docs = spark.createDataFrame(
        [(1, 10, "a"), (2, 30, "a"), (3, 30, "b"),   # cluster A
         (4, 5, "b"), (5, 50, "c"),                  # cluster B
         (9, 1, "c")],                               # unclustered
        "doc_id long, n_chars long, source string")
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1),   # cluster A: 2 and 3 tie on 30 -> 2
         (4, 4), (5, 4)],          # cluster B: 5 wins on 50
        "v long, component long")
    kept = dedup.keep_canonical(docs, comps)
    assert sorted(r.doc_id for r in kept.collect()) == [2, 5, 9]
    # empty components: everything passes through
    empty = spark.createDataFrame([], "v long, component long")
    assert dedup.keep_canonical(docs, empty).count() == 6
