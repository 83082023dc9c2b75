"""Pluggable table source: parquet path now, Iceberg when the jar exists."""

import pytest

from embulk_input_parquet_hadoop_spark.sources import datagen, table


@pytest.fixture(scope="module")
def tokens_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("src") / "tokens")
    datagen.generate(path, n_docs=300, seed=3, n_files=2)
    return path


def test_parquet_path_auto(spark, tokens_dir):
    df = table.read_tokens_table(spark, tokens_dir)
    assert df.count() == 300
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "tokens", "n_tok", "source"]


def test_table_files(spark, tokens_dir):
    df = table.read_tokens_table(spark, tokens_dir, fmt="parquet")
    files = table.table_files(df)
    assert len(files) == 2 and all(f.endswith(".parquet") for f in files)


def test_iceberg_absent_is_graceful(spark, tokens_dir):
    if table.iceberg_available(spark):
        pytest.skip("iceberg runtime present")
    with pytest.raises(RuntimeError, match="iceberg runtime"):
        table.read_tokens_table(spark, "db.tokens", fmt="iceberg")
    # auto-detect on an identifier without the runtime -> parquet attempt
    # (which then fails on a non-path), never a silent wrong answer
    df = table.read_tokens_table(spark, tokens_dir, fmt=None)
    assert df.count() == 300
