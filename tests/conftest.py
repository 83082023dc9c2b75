from __future__ import annotations

import pytest

from embulk_input_parquet_hadoop_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=8, arrow_batch_rows=2048,
                  extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tokens_path(tmp_path_factory):
    from embulk_input_parquet_hadoop_spark.sources.datagen import generate
    path = tmp_path_factory.mktemp("tokens") / "tbl"
    generate(str(path), n_docs=3000, seed=123, n_files=4)
    return str(path)
