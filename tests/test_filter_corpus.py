"""Composite corpus filter: one drop_reason per doc, first-failing-rule
attribution, map-only plan."""

from embulk_input_parquet_hadoop_spark.operators import textstats


def _doc(i, words_list, src="s"):
    return (i, " ".join(words_list), src)


def _mk(spark, docs):
    return spark.createDataFrame(
        docs, "doc_id bigint, text string, source string")


def test_each_reason_and_first_failing_order(spark):
    uniq = [f"w{j}" for j in range(40)]
    docs = [
        _doc(1, ["the", "and"]),                      # too_short (n=2)
        _doc(2, ["the"] + uniq + uniq + uniq[:14]),   # too_long (n=95)
        _doc(3, uniq[:30]),                           # bad_lang (no markers)
        _doc(4, ["the"] * 30),                        # repetitive (dup .967)
        # en, 30 words over 12 distinct: dup 0.6 <= .70, dr 0.4 < .45
        _doc(5, (["the"] + uniq[:11]) * 2 + ["the"] * 6),
        _doc(6, ["the"] + uniq[:29]),                 # kept (dr 1.0)
        _doc(7, ["zz"]),  # short AND bad_lang -> first rule wins
    ]
    out = {r.doc_id: (r.drop_reason, r.keep)
           for r in textstats.filter_corpus(
               _mk(spark, docs), "text", min_words=25, max_words=90,
               langs=("en",), max_dup_word_frac=0.70,
               min_distinct_ratio=0.45).collect()}
    assert out == {1: ("too_short", False),
                   2: ("too_long", False),
                   3: ("bad_lang", False),
                   4: ("repetitive", False),
                   5: ("low_diversity", False),
                   6: ("kept", True),
                   7: ("too_short", False)}, out


def test_plan_is_map_only(spark):
    # the whole composite must stay one embarrassingly parallel scan
    df = _mk(spark, [_doc(1, ["the"] * 30)])
    plan = textstats.filter_corpus(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan
