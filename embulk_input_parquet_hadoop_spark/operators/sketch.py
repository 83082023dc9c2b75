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
