"""Test-set decontamination: n-gram overlap against a benchmark corpus.

The operator is an LLM-pipeline addition (no reference analogue): flag
training docs sharing any k-word shingle with a (broadcast) benchmark
shingle set. These tests pin the semantics on a corpus with known
contamination; q40 oracle-gates the full per-source report vs DuckDB.
"""

from embulk_input_parquet_hadoop_spark.operators import dedup

BENCH = [(900, "the quick brown fox jumps over the lazy dog", "eval"),
         (901, "pack my box with five dozen liquor jugs", "eval")]
TRAIN = [
    # verbatim leak of bench doc 900 inside a longer doc
    (1, "intro text the quick brown fox jumps over the lazy dog outro",
     "webA"),
    # shares only a 4-word run with bench 901 -> below k=5, clean
    (2, "pack my box with nothing else in common here at all", "webA"),
    # no overlap at all
    (3, "completely unrelated training document with its own words",
     "webB"),
    # two separate 5-gram leaks from doc 900
    (4, "quick brown fox jumps over something and over the lazy dog too",
     "webB"),
]
SCHEMA = "doc_id bigint, text string, source string"


def test_contaminated_ids_exact_overlap(spark):
    train = spark.createDataFrame(TRAIN, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    rows = {r.doc_id: r.n_gram_hits
            for r in dedup.contaminated_ids(
                train, bench, "doc_id", "text", k=5).collect()}
    # doc 1 embeds all 5 of bench-900's 5-shingles; doc 2's 4-word run is
    # under k; doc 4 contains 'quick brown fox jumps over' and
    # 'over the lazy dog too'->no ('too' breaks it), so exactly 1 hit
    assert set(rows) == {1, 4}, rows
    assert rows[1] == 5, rows
    assert rows[4] == 1, rows


def test_contamination_report_per_source(spark):
    train = spark.createDataFrame(TRAIN, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    rows = {r.source: (r.n_flagged, r.n_gram_hits)
            for r in dedup.contamination_report(
                train, bench, "doc_id", "text", "source", k=5).collect()}
    assert rows == {"webA": (1, 5), "webB": (1, 1)}, rows


def test_decontaminate_via_antijoin(spark):
    # the subtractive use: anti-join the flagged ids out of the corpus
    train = spark.createDataFrame(TRAIN, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    flagged = dedup.contaminated_ids(train, bench, "doc_id", "text", k=5)
    clean = train.join(flagged, "doc_id", "left_anti")
    assert {r.doc_id for r in clean.collect()} == {2, 3}


def test_broadcast_in_plan(spark):
    # the benchmark side must reach the probe as a broadcast hash join:
    # at 100 TB the training scan cannot shuffle on shingle
    train = spark.createDataFrame(TRAIN, SCHEMA)
    bench = spark.createDataFrame(BENCH, SCHEMA)
    plan = dedup.contaminated_ids(
        train, bench, "doc_id", "text", k=5)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
