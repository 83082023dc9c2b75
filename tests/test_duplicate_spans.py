"""dedup.duplicate_spans — exact duplicate k-gram span detection.

Hand-built corpora with known spans, plus a randomized parity check
against a transparent pure-Python reference (same first-occurrence and
merge rules, written independently of the DataFrame plan).
"""

from __future__ import annotations

import random

from embulk_input_parquet_hadoop_spark.operators import dedup


def _spans(spark, rows, k):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = dedup.duplicate_spans(df, "doc_id", "text", k=k)
    return sorted((r.doc_id, r.span_start, r.span_end)
                  for r in out.collect())


def test_identical_docs_full_span(spark):
    # doc 1 is the global first occurrence of every gram -> no spans;
    # doc 2 duplicates every window -> one merged span over all words
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    assert _spans(spark, rows, k=3) == [(2, 1, 6)]


def test_internal_repetition(spark):
    # "x y z" repeats inside ONE doc: pos 4..7 grams duplicate pos 1..3
    # ones -> merged span words 4..9
    rows = [(1, "x y z x y z x y z")]
    assert _spans(spark, rows, k=3) == [(1, 4, 9)]


def test_adjacent_spans_merge(spark):
    # two disjoint repeated trigrams sit back-to-back in doc 2:
    # spans [1,3] and [4,6] are adjacent -> ONE span [1,6]
    rows = [(1, "a b c q r s"), (2, "a b c d e f g"),
            (3, "d e f q r s")]
    # doc 2: "a b c" dups doc 1 -> [1,3]; "d e f" is FIRST here (doc 3
    # duplicates it) -> doc 2 has only [1,3]; doc 3: "d e f" dups doc 2
    # -> [1,3] and "q r s" dups doc 1 -> [4,6], adjacent -> [1,6]
    assert _spans(spark, rows, k=3) == [(2, 1, 3), (3, 1, 6)]


def test_separated_spans_stay_separate(spark):
    # repeated trigrams with a unique gap word between them: two spans
    rows = [(1, "a b c q r s"), (2, "a b c GAP1 GAP2 q r s")]
    assert _spans(spark, rows, k=3) == [(2, 1, 3), (2, 6, 8)]


def test_short_and_unique_docs_yield_nothing(spark):
    rows = [(1, "only two"), (2, "all words here unique entirely"),
            (3, "only two")]  # doc 3 dups doc 1 but len < k
    assert _spans(spark, rows, k=3) == []


def _py_reference(rows, k):
    """Transparent reimplementation: first occurrence by (id, pos),
    merge overlapping-or-adjacent spans per doc."""
    occ = []  # (gram, id, pos)
    for i, text in rows:
        ws = [w for w in text.split(" ") if w]
        for p in range(len(ws) - k + 1):
            occ.append((" ".join(ws[p:p + k]), i, p + 1))
    first = {}
    for g, i, p in sorted(occ, key=lambda t: (t[1], t[2])):
        first.setdefault(g, (i, p))
    per_doc = {}
    counts = {}
    for g, _, _ in occ:
        counts[g] = counts.get(g, 0) + 1
    for g, i, p in occ:
        if counts[g] > 1 and first[g] != (i, p):
            per_doc.setdefault(i, []).append((p, p + k - 1))
    out = []
    for i, spans in per_doc.items():
        spans.sort()
        cur_s, cur_e = spans[0]
        for s, e in spans[1:]:
            if s <= cur_e + 1:
                cur_e = max(cur_e, e)
            else:
                out.append((i, cur_s, cur_e))
                cur_s, cur_e = s, e
        out.append((i, cur_s, cur_e))
    return sorted(out)


def test_randomized_parity_with_python_reference(spark):
    rng = random.Random(42)
    vocab = [f"w{j}" for j in range(12)]  # tiny vocab -> many collisions
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 40))))
            for i in range(60)]
    assert _spans(spark, rows, k=3) == _py_reference(rows, 3)
    assert _spans(spark, rows, k=5) == _py_reference(rows, 5)


def test_remove_duplicate_spans_rebuilds_text(spark):
    rows = [(1, "a b c d e f"), (2, "a b c d e f"),
            (3, "u v w x y z")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = dedup.duplicate_spans(df, "doc_id", "text", k=3)
    out = dedup.remove_duplicate_spans(df, spans, "doc_id", "text")
    got = {r.doc_id: r.text_dedup for r in out.collect()}
    # doc 1 is the first occurrence -> untouched (byte-identical);
    # doc 2 is wholly duplicated -> empty; doc 3 unique -> untouched
    assert got == {1: "a b c d e f", 2: "", 3: "u v w x y z"}


def test_remove_partial_span_keeps_surrounding_words(spark):
    rows = [(1, "a b c q r s"), (2, "PRE a b c POST1 POST2")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = dedup.duplicate_spans(df, "doc_id", "text", k=3)
    out = dedup.remove_duplicate_spans(df, spans, "doc_id", "text")
    got = {r.doc_id: r.text_dedup for r in out.collect()}
    assert got[1] == "a b c q r s"
    assert got[2] == "PRE POST1 POST2"


def test_remove_matches_python_reference_on_random_corpus(spark):
    rng = random.Random(7)
    vocab = [f"w{j}" for j in range(10)]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for i in range(50)]
    k = 3
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    spans = dedup.duplicate_spans(df, "doc_id", "text", k=k)
    out = dedup.remove_duplicate_spans(df, spans, "doc_id", "text")
    got = {r.doc_id: r.text_dedup for r in out.collect()}
    ref_spans = {}
    for i, s, e in _py_reference(rows, k):
        ref_spans.setdefault(i, []).append((s, e))
    for i, text in rows:
        if i not in ref_spans:
            assert got[i] == text
            continue
        ws = [w for w in text.split(" ") if w]
        keep = [w for p, w in enumerate(ws, start=1)
                if not any(s <= p <= e for s, e in ref_spans[i])]
        assert got[i] == " ".join(keep)


def test_contaminated_spans_against_benchmark(spark):
    train = spark.createDataFrame(
        [(1, "PRE a b c MID d e f POST"), (2, "clean words only here"),
         (3, "a b c")],
        "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(100, "a b c x y z d e f")], "doc_id bigint, text string")
    spans = dedup.contaminated_spans(train, bench, "doc_id", "text",
                                     k=3)
    got = sorted((r.doc_id, r.span_start, r.span_end)
                 for r in spans.collect())
    # doc 1: "a b c" at words 2-4 and "d e f" at 6-8, NOT adjacent
    # (word 5 "MID" survives); doc 3 wholly matches
    assert got == [(1, 2, 4), (1, 6, 8), (3, 1, 3)]
    clean = dedup.remove_duplicate_spans(train, spans, "doc_id", "text")
    texts = {r.doc_id: r.text_dedup for r in clean.collect()}
    assert texts == {1: "PRE MID POST",
                     2: "clean words only here", 3: ""}


def test_contaminated_spans_broadcasts_benchmark_grams(spark):
    train = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(1000, "w3 w4 w5")], "doc_id bigint, text string")
    spans = dedup.contaminated_spans(train, bench, "doc_id", "text",
                                     k=3)
    plan = spans._jdf.queryExecution().executedPlan().toString()
    # the benchmark gram probe must be a map-side broadcast hash join
    # (zero shuffle on the corpus scan), mirroring contamination_report
    assert "BroadcastHashJoin" in plan


def test_gram_extraction_materializes_word_array(spark):
    # regression guard for the O(len^2) HOF-CSE defect: the generator
    # must reference a projected _ws attribute; if the word-split ever
    # collapses into the gram lambda, element_at re-evaluates the full
    # split/filter PER ELEMENT (q12 2.8->12.8s when this regressed)
    df = spark.createDataFrame([(1, "a b c d e f")],
                               "doc_id bigint, text string")
    for q in (dedup.word_shingles(df, "doc_id", "text", k=3),
              dedup._gram_occurrences(df, "doc_id", "text", 3)):
        opt = q._jdf.queryExecution().optimizedPlan().toString()
        assert "AS _ws" in opt, opt
        assert "element_at(filter(" not in opt.replace(" ", ""), opt


def test_min_count_frequency_floor(spark):
    # "a b c" occurs 3x, "q r s" occurs 2x: at min_count=3 only the
    # former's non-first occurrences are spans
    rows = [(1, "a b c q r s"), (2, "a b c q r s"), (3, "a b c")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    assert sorted((r.doc_id, r.span_start, r.span_end) for r in
                  dedup.duplicate_spans(df, "doc_id", "text", k=3,
                                        min_count=3).collect()) \
        == [(2, 1, 3), (3, 1, 3)]
    # default min_count=2 keeps the old semantics
    assert sorted((r.doc_id, r.span_start, r.span_end) for r in
                  dedup.duplicate_spans(df, "doc_id", "text",
                                        k=3).collect()) \
        == [(2, 1, 6), (3, 1, 3)]
