"""Unit semantics for the Gopher repetition filters and the KMV sketch
(the oracle-parity test covers engine agreement; these pin the math)."""

from __future__ import annotations

from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import sketch, textstats


def test_repetition_flags_degenerate_vs_diverse(spark):
    df = spark.createDataFrame(
        [(1, "x y x y x y z"),          # top bigram "x y" 3/6 overlapping
         (2, "alpha beta gamma delta echo fox golf hotel"),
         (3, "a a a a"),                # 1 distinct / 4 words
         (4, "")],
        "doc_id int, text string")
    rows = {r.doc_id: r for r in
            textstats.repetition_features(df, "text").collect()}
    assert rows[1].repetitive and rows[1].top_bigram_frac > 0.5
    assert not rows[2].repetitive
    assert rows[2].dup_word_frac == 0.0
    assert rows[3].repetitive and rows[3].dup_word_frac == 0.75
    # empty doc: all fractions defined (0.0), not null, not flagged
    assert rows[4].dup_word_frac == 0.0 and not rows[4].repetitive


def test_repetition_trigram_fraction_exact(spark):
    # "p q r" occurs twice among 5 trigrams of a 7-word doc: 3*2/7
    df = spark.createDataFrame([(1, "p q r s p q r")],
                               "doc_id int, text string")
    r = textstats.repetition_features(df, "text").collect()[0]
    assert abs(r.top_trigram_frac - 3 * 2 / 7) < 1e-12


def test_kmv_small_group_is_exact(spark):
    df = spark.createDataFrame(
        [("a", f"v{i}") for i in range(5)] * 3,  # dups must not count
        "key string, val string")
    r = sketch.kmv_distinct(df, "key", "val", k=32).collect()
    assert len(r) == 1
    assert r[0].n_exact == 5 and r[0].kmv_est == 5.0


def test_kmv_estimate_within_error_bound(spark):
    n = 2000
    df = spark.range(n).select(
        F.lit("g").alias("key"),
        F.concat(F.lit("tok_"), F.col("id")).alias("val"))
    r = sketch.kmv_distinct(df, "key", "val", k=64).collect()[0]
    assert r.n_exact == n
    # KMV std-err ~ 1/sqrt(k-2) ≈ 0.127 at k=64; allow 4 sigma
    assert abs(r.kmv_est - n) / n < 0.51


def test_word_commonness_matches_local(spark):
    """word_commonness vs a pure-Python reference on a corpus with one
    common-word doc and one rare-word doc: integer ppm floors, exact."""
    from collections import Counter
    from embulk_input_parquet_hadoop_spark.operators import textstats
    texts = {
        1: "the the the cat",
        2: "zyx qwv zyx",
        3: "the cat sat",
        4: "",  # empty: dropped
    }
    df = spark.createDataFrame(list(texts.items()),
                               "doc_id long, text string")
    out = {r.doc_id: (r.n_words, r.commonness_ppm)
           for r in textstats.word_commonness(df).collect()}

    allw = [w for t in texts.values() for w in t.split() if w]
    freq = Counter(allw)
    tot = len(allw)
    exp = {}
    for d, t in texts.items():
        ws = [w for w in t.split() if w]
        if not ws:
            continue
        ppms = [freq[w] * 1_000_000 // tot for w in ws]
        exp[d] = (len(ws), sum(ppms) // len(ws))
    assert out == exp
    assert 4 not in out
    # the common-word doc scores strictly higher than the rare-word doc
    assert out[1][1] > out[2][1]


def test_word_commonness_broadcasts_frequency_table(spark):
    """The ppm rejoin must be a broadcast hash join — a shuffled join on
    the exploded word stream would re-shuffle the whole corpus."""
    from embulk_input_parquet_hadoop_spark.operators import textstats
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a a d")], "doc_id long, text string")
    plan = textstats.word_commonness(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_bounded_quantiles_exact_and_partition_independent(spark):
    from embulk_input_parquet_hadoop_spark.operators import sketch
    # group a: values 1..100 once each -> p50 = 50 (cum 50 >= ceil(.5*100)),
    # p90 = 90, p99 = 99. group b: heavy ties.
    rows = [(f"a", v) for v in range(1, 101)] + [("b", 7)] * 95 + \
        [("b", 9)] * 5
    df = spark.createDataFrame(rows, "g string, v long")
    def run(d):
        return {(r.g, r.q): r.value
                for r in sketch.bounded_quantiles(d, "v", "g").collect()}
    got = run(df)
    assert got[("a", 0.5)] == 50 and got[("a", 0.9)] == 90 \
        and got[("a", 0.99)] == 99
    assert got[("b", 0.5)] == 7 and got[("b", 0.99)] == 9
    assert run(df.repartition(17)) == got


def test_repetition_preserves_reserved_user_columns(spark):
    """User columns that collide with the operator's scratch names must
    survive untouched (scratch names uniquify around them)."""
    from embulk_input_parquet_hadoop_spark.operators import textstats
    df = spark.createDataFrame(
        [("a a a a", "keep1", "keep2")],
        "text string, _rep_ws string, _tng_sng string")
    out = textstats.repetition_features(df, "text").collect()[0]
    assert out._rep_ws == "keep1" and out._tng_sng == "keep2"
    assert out.dup_word_frac == 0.75
