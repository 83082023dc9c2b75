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


def test_scrub_pii_counts_and_replacements(spark):
    df = spark.createDataFrame(
        [(1, "write bob.smith+x@corp.example.org or 192.168.0.1 "
             "ssn 123-45-6789 done"),
         (2, "clean text, no pii at all"),
         (3, "two mails a@b.io c@d.co one ip 10.0.0.255")],
        "id int, text string")
    out = {r.id: r for r in textstats.scrub_pii(df).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_ssn) == (1, 1, 1)
    assert out[1].text == "write <EMAIL> or <IP> ssn <SSN> done"
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_ssn) == (0, 0, 0)
    assert out[2].text == "clean text, no pii at all"
    assert (out[3].n_email, out[3].n_ipv4) == (2, 1)
    assert out[3].text == "two mails <EMAIL> <EMAIL> one ip <IP>"
    # out_col keeps the original text column intact
    kept = textstats.scrub_pii(df, out_col="clean").collect()[0]
    assert "<EMAIL>" not in kept.text and "@" in kept.text


def test_scrub_pii_is_map_only(spark):
    df = spark.createDataFrame([(1, "a@b.io")], "id int, text string")
    plan = textstats.scrub_pii(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_scrub_pii_count_column_collision_refused(spark):
    import pytest
    df = spark.createDataFrame([(1, "x", 5)],
                               "id int, text string, n_email int")
    with pytest.raises(ValueError, match="n_email"):
        textstats.scrub_pii(df)


def test_scrub_pii_property_no_matches_survive(spark):
    """Property over random text with injected PII: every pattern's
    count equals the matches in the original, and NO pattern matches
    the scrubbed output (the q56 core invariant, independent of the
    oracle)."""
    import random
    import re
    rng = random.Random(20260820)
    words = ["alpha", "beta", "x9", "a.b", "u@", "@h.io", "1.2",
             "123-45", "-6789", "10.0.0.1", "bob@corp.io", "", "dots..."]
    rows = []
    for i in range(120):
        txt = " ".join(rng.choice(words)
                       for _ in range(rng.randint(0, 12)))
        rows.append((i, txt))
    df = spark.createDataFrame(rows, "id int, text string")
    out = {r.id: r for r in textstats.scrub_pii(df).collect()}
    for i, txt in rows:
        r = out[i]
        for kind, (rx, tok) in textstats.PII_PATTERNS.items():
            assert getattr(r, f"n_{kind}") == len(re.findall(rx, txt)), \
                (txt, kind)
            assert not re.search(rx, r.text), (txt, kind, r.text)
