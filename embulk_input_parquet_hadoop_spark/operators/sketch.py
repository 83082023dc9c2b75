"""Mergeable cardinality sketches for corpus-scale statistics.

KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every distinct value
to (0, 1), keep the k smallest per group, estimate |D| = (k-1) / h_(k).
At 100 TB this replaces count(DISTINCT) — whose state is O(|D|) per group —
with O(k) bounded state that merges associatively across partitions; here
the merge IS the shuffle (distinct + one windowed rank per group).

Hashes are md5-derived (32-bit prefix), so the estimate — not just the
error bound — is bit-reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = float(1 << 32)


def _h01(value):
    """md5-derived uniform hash of ``value`` into (0, 1)."""
    h = F.conv(F.substring(F.md5(value), 1, 8), 16, 10).cast("long")
    return h / F.lit(_HASH_SPACE)


def kmv_distinct(df: DataFrame, key_col: str, value_col: str,
                 k: int = 32) -> DataFrame:
    """Per-key KMV distinct-count estimate: (key, n_exact, kmv_est).

    ``n_exact`` rides along from the same distinct set (one pass) so
    callers can report estimator error; groups with fewer than k distinct
    values return the exact count (the standard small-cardinality rule).
    Ties on the 32-bit hash are broken by the value itself, so the k-th
    minimum — and therefore the estimate — is deterministic.

    Plan: distinct(key, value) -> one window per key (rank by hash).
    Both shuffles are keyed by ``key_col``; nothing is ever collected.
    """
    dv = df.select(F.col(key_col).alias("key"),
                   F.col(value_col).alias("val")).distinct()
    frac = _h01(F.col("val"))
    w = Window.partitionBy("key").orderBy(frac, F.col("val"))
    ranked = dv.select(
        "key", frac.alias("frac"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("key")).alias("n_exact"))
    kth = ranked.filter(
        F.col("rn") == F.least(F.lit(k), F.col("n_exact")))
    est = (F.when(F.col("n_exact") < k, F.col("n_exact").cast("double"))
           .otherwise(F.lit(float(k - 1)) / F.col("frac")))
    return kth.select(F.col("key").alias(key_col),
                      F.col("n_exact"),
                      F.round(est, 2).alias("kmv_est"))


def bounded_quantiles(df: DataFrame, value_col: str, group_col: str,
                      qs: tuple[float, ...] = (0.5, 0.9, 0.99)
                      ) -> DataFrame:
    """EXACT per-group quantiles of a bounded integer domain —
    (group_col, q, value) — with O(|groups| x |domain|) total state.

    The scale pattern: for a bounded domain (token counts <= 8192,
    quality scores in basis points, byte lengths), exact quantiles need
    no sort of the data and no sketch error — ONE map-side-combined
    count aggregation collapses 10^12 rows to |groups| x |domain| cells,
    then a per-group cumulative window over the cells (thousands of
    rows) reads the answers off. approx_percentile trades error for the
    same shuffle shape; this is exact for free when the domain is
    bounded.

    Quantile definition (shared verbatim with the oracle so parity is by
    construction, not by matching an engine's interpolation flavor): the
    smallest value whose cumulative count reaches ceil(q * n). Integer
    threshold, no float interpolation.
    """
    if not qs:
        raise ValueError("qs must be non-empty")
    h = (df.groupBy(group_col, value_col)
         .agg(F.count(F.lit(1)).alias("c")))
    wcum = (Window.partitionBy(group_col).orderBy(value_col)
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = (Window.partitionBy(group_col)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    cells = (h.withColumn("cum", F.sum("c").over(wcum))
             .withColumn("n", F.sum("c").over(wall)))
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs],
                                          "q double")
    # threshold = ceil(q * n) as an integer comparison on counts
    hit = (cells.join(F.broadcast(qdf))
           .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n"))))
    wmin = Window.partitionBy(group_col, "q").orderBy(value_col)
    return (hit.withColumn("rk", F.row_number().over(wmin))
            .filter(F.col("rk") == 1)
            .select(group_col, "q", F.col(value_col).alias("value")))
