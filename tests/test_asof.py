"""As-of join semantics: equal-ts match, no-prior-row nulls, tolerance."""

from datetime import datetime

from embulk_input_parquet_hadoop_spark.operators import asof


def test_asof_join_semantics(spark):
    L = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 10, 0), "p1"),
         (1, datetime(2026, 1, 1, 12, 0), "p2"),
         (2, datetime(2026, 1, 1, 9, 0), "p3"),   # before any right row
         (3, datetime(2026, 1, 1, 10, 0), "p4")], # equal-ts match
        "user_id bigint, ts timestamp, tag string")
    R = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 9, 30), 100.0),
         (1, datetime(2026, 1, 1, 11, 0), 200.0),
         (2, datetime(2026, 1, 1, 9, 30), 300.0),
         (3, datetime(2026, 1, 1, 10, 0), 400.0)],
        "user_id bigint, ts timestamp, value double")
    out = {r.tag: r for r in
           asof.asof_join(L, R, on="user_id",
                          right_cols=["value"]).collect()}
    assert out["p1"].value_asof == 100.0
    assert out["p2"].value_asof == 200.0
    assert out["p3"].value_asof is None and out["p3"].ts_asof is None
    assert out["p4"].value_asof == 400.0  # ties match

    tol = {r.tag: r for r in
           asof.asof_join(L, R, on="user_id", right_cols=["value"],
                          tolerance_seconds=1800).collect()}
    assert tol["p1"].value_asof == 100.0   # 30 min gap, in tolerance
    assert tol["p2"].value_asof is None    # 60 min gap, nulled
