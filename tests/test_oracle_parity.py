"""Driver-style oracle parity: run each queries() entry on Spark AND its
oracle_sql() on DuckDB over the same parquet tables; compare as multisets
(columns sorted by name — exactly the driver's comparison shape)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if v is None:
                vals.append("NULL")
            elif isinstance(v, float):
                if math.isnan(v):
                    vals.append("NULL")
                else:
                    vals.append(f"{v:.6g}")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}")
    a = _normalize(spark_rows, spark_cols)
    b = _normalize(duck_rows, duck_cols)
    assert len(a) == len(b), (
        f"{name}: row count {len(a)} vs oracle {len(b)}")
    mism = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mism, f"{name}: first mismatches: {mism[:5]}"


def test_all_queries_have_oracles_or_are_documented():
    missing = set(QUERIES) - set(ORACLES)
    # weak-check (rows-only) queries must be intentional
    assert missing == {"q22_srp_bucket_sizes", "q25_multimodal_features",
                       "q26_srp_neardup_bucketed"}, missing


def test_weak_queries_run(spark):
    for name in set(QUERIES) - set(ORACLES):
        df = QUERIES[name](spark, SF_DIR)
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.verify_ok for r in rows)
