"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB does); this expresses it as a
composition of existing DataFrame ops — union + partitioned running
``last(ignorenulls)`` window — exactly the (a)-tier strategy SURVEY/brief
prescribe for operators Spark lacks: one shuffle on the join key, no
Python anywhere, AQE-friendly.

Semantics match DuckDB's ``ASOF LEFT JOIN ... ON l.k = r.k AND
l.ts >= r.ts``: equal timestamps match (right side sorts before left at
ties); left rows with no prior right row get nulls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: list[str] | None = None,
              suffix: str = "_asof",
              tolerance_seconds: float | None = None) -> DataFrame:
    """Left as-of join on ``on`` with time columns ``left_ts``/``right_ts``.

    ``right_cols``: right-side value columns to carry (default: all except
    the key and timestamp). ``tolerance_seconds``: matches older than this
    are nulled out (the row is kept, like pandas.merge_asof).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, right_ts)]
    carried = [f"{c}{suffix}" for c in right_cols] + [f"{right_ts}{suffix}"]

    lhs = left.select(
        F.col(on), F.col(left_ts).alias("_t"), F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"{c}{suffix}")
          for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType)
        .alias(f"{right_ts}{suffix}"))
    rhs = right.select(
        F.col(on), F.col(right_ts).alias("_t"), F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != on],
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"))

    unioned = lhs.unionByName(rhs)
    # right rows (side 0) sort before left rows at equal timestamps, so an
    # equal-ts right row is visible to the left row — DuckDB ASOF semantics
    w = (Window.partitionBy(on).orderBy("_t", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_f_{c}")
               for c in carried])
    out = (filled.filter(F.col("_side") == 1)
           .select(F.col(on),
                   *[F.col(c) for c in left.columns if c != on],
                   *[F.col(f"_f_{c}").alias(c) for c in carried]))
    if tolerance_seconds is not None:
        ts_asof = F.col(f"{right_ts}{suffix}")
        # unix_micros via a timestamp cast handles both TIMESTAMP and
        # TIMESTAMP_NTZ inputs (a direct cast-to-double rejects NTZ)
        gap_s = (F.unix_micros(F.col(left_ts).cast("timestamp"))
                 - F.unix_micros(ts_asof.cast("timestamp"))) / 1e6
        in_tol = gap_s <= tolerance_seconds
        out = out.select(
            on, *[c for c in left.columns if c != on],
            *[F.when(in_tol, F.col(c)).otherwise(F.lit(None)).alias(c)
              for c in carried])
    return out
