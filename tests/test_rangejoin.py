"""Bucketed range join vs a brute-force reference plan."""

from pyspark.sql import functions as F

from embulk_input_parquet_hadoop_spark.operators import rangejoin


def test_range_join_matches_bruteforce(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    left = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "ts", "event_id")
    right = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value")
    got = rangejoin.range_join(left, right, on="user_id",
                               lower_us=1, upper_us=3_600_000_000)
    lts = F.unix_micros(F.col("l.ts").cast("timestamp"))
    rts = F.unix_micros(F.col("r.ts").cast("timestamp"))
    brute = (left.alias("l").join(right.alias("r"), "user_id")
             .filter((rts >= lts + 1) & (rts <= lts + 3_600_000_000)))
    assert got.count() == brute.count() > 0
    # same multiset of (event_id, value) pairs
    a = got.select("event_id", "value_r")
    b = brute.select("l.event_id", "r.value")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_range_join_bucket_boundaries(spark):
    rows_l = [(1, "2026-01-01 00:59:59.999999", "a"),
              (1, "2026-01-01 00:00:00", "b")]
    rows_r = [(1, "2026-01-01 01:00:00", 5.0),    # 1us after a; 1h after b
              (1, "2026-01-01 02:00:00.000001", 7.0)]  # just out for a
    L = spark.createDataFrame(rows_l, "user_id bigint, t string, tag string") \
        .select("user_id", F.to_timestamp("t").alias("ts"), "tag")
    R = spark.createDataFrame(rows_r, "user_id bigint, t string, value double") \
        .select("user_id", F.to_timestamp("t").alias("ts"), "value")
    got = rangejoin.range_join(L, R, on="user_id", lower_us=1,
                               upper_us=3_600_000_000)
    pairs = {(r.tag, r.value_r) for r in got.collect()}
    assert pairs == {("a", 5.0), ("b", 5.0)}


def test_range_join_large_epoch_exact(spark):
    """Bucket ids past float64's 2^52 exact-integer range (ADVICE r1):
    arithmetic-shift bucketing must keep boundary pairs exact."""
    base = 221_845_392_000_000_007  # epoch micros ~year 9000, past 2^52
    span = 3_600_000_000
    L = spark.range(1).select(
        F.lit(1).alias("user_id"),
        F.timestamp_micros(F.lit(base)).alias("ts"))
    rvals = [base + 1, base + span,          # inclusive bounds: in
             base, base + span + 1]          # just outside: out
    R = (spark.createDataFrame(
        [(1, v, float(i)) for i, v in enumerate(rvals)],
        "user_id bigint, us bigint, value double")
        .select("user_id", F.timestamp_micros(F.col("us")).alias("ts"),
                "value"))
    got = rangejoin.range_join(L, R, on="user_id", lower_us=1,
                               upper_us=span)
    assert sorted(r.value_r for r in got.collect()) == [0.0, 1.0]
