"""Bucketed range join: right rows whose timestamp falls in a bounded
window after each left row's timestamp.

OSS Spark plans a key-equi + time-range join as an equi-join on the key
with the range as a post-filter — fine — but with a *hot key* the per-key
cross product explodes. The standard fix (native in DuckDB/Databricks as
"range join optimization") is to also equi-join on a time bucket of width
= the window span: each left row matches at most 2 consecutive buckets, so
the join is (key, bucket)-partitionable and per-partition work is bounded
by bucket occupancy, not key cardinality. Exact bounds are re-checked
after the bucket join; each qualifying pair appears exactly once (the
right row owns exactly one bucket).

Pure DataFrame composition — explode over at most 2 bucket ids per left
row, one shuffle on (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str = "ts", right_ts: str = "ts",
               lower_us: int = 0, upper_us: int = 3_600_000_000,
               suffix: str = "_r") -> DataFrame:
    """Pairs (l, r) with same ``on`` key and
    ``l.ts + lower_us <= r.ts <= l.ts + upper_us`` (microseconds).

    Returns left columns + right columns suffixed. Bucket width = the next
    power of two >= the window span (so each left interval spans <= 2
    buckets, 3 at the exact-boundary edge). Power-of-two widths let bucket
    ids be computed with an arithmetic right shift — exact floor division
    on the full int64 domain, where ``floor(ts / width)`` in float64 is
    only exact below 2^52 and can misbucket a boundary row differently on
    the two join sides (silently dropping a qualifying pair).
    """
    if upper_us < lower_us:
        raise ValueError("upper_us < lower_us")
    span = max(upper_us - lower_us, 1)
    shift = (span - 1).bit_length()  # 2**shift >= span, minimal

    lts = F.unix_micros(F.col(left_ts).cast("timestamp"))
    rts = F.unix_micros(F.col(right_ts).cast("timestamp"))

    lo = lts + F.lit(lower_us)
    hi = lts + F.lit(upper_us)
    lhs = (left.withColumn("_lo", lo).withColumn("_hi", hi)
           .withColumn("_b", F.explode(F.sequence(
               F.shiftright(F.col("_lo"), shift),
               F.shiftright(F.col("_hi"), shift)))))
    rhs = right.select(
        F.col(on).alias(f"{on}{suffix}"),
        F.shiftright(rts, shift).alias("_rb"),
        rts.alias("_rts"),
        *[F.col(c).alias(f"{c}{suffix}")
          for c in right.columns if c != on])
    joined = lhs.join(rhs, (F.col(on) == F.col(f"{on}{suffix}"))
                      & (F.col("_b") == F.col("_rb")))
    exact = joined.filter((F.col("_rts") >= F.col("_lo"))
                          & (F.col("_rts") <= F.col("_hi")))
    return exact.drop("_lo", "_hi", "_b", "_rb", "_rts", f"{on}{suffix}")
