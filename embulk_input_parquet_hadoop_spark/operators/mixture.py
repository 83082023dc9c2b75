"""Deterministic training-mixture weighting.

Pretraining corpora are mixed with per-source weights ("2.5 epochs of
wiki, 0.3 of web"): every document from source s appears ``floor(w_s)``
times, plus one more time with probability ``frac(w_s)``. The fractional
inclusion is decided by an md5 hash of (seed, doc id) — a pure function of
the row, so the sample is reproducible run-to-run, independent of
partitioning, and exactly reproducible by any other engine (the DuckDB
oracle rebuilds it bit-for-bit; no RNG state, no ``rand()``).

Plan shape: weights arrive as a broadcast join (tiny dim table), the
repetition is one ``explode(sequence(...))`` bounded by ``ceil(max w)`` —
map-only, no shuffle introduced by this operator at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 15 hex chars = 60 bits: exact in int64 on every engine (the same trick
# functions/hashes.py uses for token ids and SRP planes)
_HASH_BITS = 60


def _unit_hash(seed: int, id_col: Column) -> Column:
    """md5-derived integer in [0, 2^60): deterministic per (seed, id)."""
    h = F.md5(F.concat(F.lit(f"mix:{seed}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def mixture_sample(df: DataFrame, weights: dict[str, float],
                   source_col: str = "source", id_col: str = "doc_id",
                   seed: int = 0) -> DataFrame:
    """Repeat each row to its source's mixture weight.

    Returns the input rows with an extra ``epoch`` column (1-based copy
    index); a doc from a source with weight 2.3 appears as epochs 1, 2 and
    — for the md5-selected 30% of ids — 3. Sources absent from ``weights``
    get weight 0 (dropped).
    """
    spark = df.sparkSession
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for {s!r}: {w}")
    wrows = [(s, int(math.floor(w)),
              int((w - math.floor(w)) * (1 << _HASH_BITS)))
             for s, w in weights.items()]
    wdf = spark.createDataFrame(
        wrows, f"{source_col} string, w_full int, w_frac_thresh long")
    extra = (_unit_hash(seed, F.col(id_col)) < F.col("w_frac_thresh")
             ).cast("int")
    n_copies = (F.col("w_full") + extra).alias("n_copies")
    j = (df.join(F.broadcast(wdf), source_col)
         .withColumn("n_copies", n_copies)
         .filter(F.col("n_copies") > 0))
    return (j.withColumn("epoch", F.explode(F.sequence(F.lit(1),
                                                       F.col("n_copies"))))
            .drop("w_full", "w_frac_thresh", "n_copies"))


def split_thresholds(fractions: dict[str, float]) -> list[int]:
    """Cumulative 60-bit integer thresholds for ``split_assign``, one per
    split except the last (which absorbs the remainder). Exposed so an
    external reproduction (e.g. a SQL oracle) embeds the exact same
    integers — sequential float accumulation is ulp-sensitive (0.9+0.05
    != 0.95), so the boundary must come from ONE computation, not two."""
    names = list(fractions)
    cum, out = 0.0, []
    for s in names[:-1]:
        cum += fractions[s]
        out.append(int(cum * (1 << _HASH_BITS)))
    return out


def split_assign(df: DataFrame, fractions: dict[str, float],
                 id_col: str = "doc_id", seed: int = 0,
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split: one label column per row.

    Each id's md5-derived unit hash lands in exactly one of the
    cumulative-fraction buckets — e.g. ``{"train": .98, "val": .01,
    "test": .01}``. The assignment is a pure function of (seed, id):
    reproducible run-to-run, independent of partitioning and cluster
    size, stable when the corpus grows (an id keeps its split as other
    rows come and go — the property ``randomSplit`` cannot give you),
    and exactly reproducible by any other engine. Thresholds are
    precomputed 60-bit integers, so there is no float comparison to
    drift. Map-only: adds no shuffle at any scale; the last split
    absorbs rounding remainder so every row is labeled.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for s, p in fractions.items():
        if p < 0:
            raise ValueError(f"negative fraction for {s!r}: {p}")
    total = sum(fractions.values())
    if not math.isclose(total, 1.0, abs_tol=1e-9):
        raise ValueError(f"fractions must sum to 1, got {total}")
    names = list(fractions)
    thresholds = split_thresholds(fractions)
    from ..functions.hashes import md5_long
    hv = md5_long(F.concat(F.lit(f"split:{seed}:"),
                           F.col(id_col).cast("string")))
    label = F.lit(names[-1])
    for s, t in zip(reversed(names[:-1]), reversed(thresholds)):
        label = F.when(hv < F.lit(t), F.lit(s)).otherwise(label)
    # reversed so the FIRST matching threshold wins in the when-chain
    return df.withColumn(out_col, label)


def sample_exact_k(df: DataFrame, k: int, group_col: str = "source",
                   id_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically.

    The training-data use case: "give me exactly 10k eval docs per
    source" — ``df.sample()`` gives a binomial count and depends on
    partitioning; this picks the k smallest md5(seed, id) hashes per
    group, a pure function of the data, reproducible by any engine.

    TWO-PHASE selection like ``similarity.centroid_outliers``: each input
    partition keeps its own k smallest (group, hash) rows in O(k) state
    per group seen (pandas map, no exchange), then one window sorts only
    |partitions| x k rows per group — a skewed 55%-of-corpus source at
    10^12 rows never hits a single-task whole-group sort. The union of
    per-partition top-ks provably contains the global top-k. Local state
    is O(|groups in the partition| x k): right for low-cardinality
    strata (sources, languages, splits); for millions of groups,
    repartition by ``group_col`` first so each task holds few groups —
    the window shuffle that follows is on the same key anyway.

    Returns (group_col, id_col, rk) with rk in [1, k] by hash order.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    key = _unit_hash(seed, F.col(id_col))
    scored = df.select(group_col, id_col, key.alias("_hk"))
    gtype = scored.schema[group_col].dataType.simpleString()
    itype = scored.schema[id_col].dataType.simpleString()

    def local_topk(batches):
        import pandas as pd
        state = None
        for pdf in batches:
            both = pdf if state is None else pd.concat([state, pdf])
            # dropna=False: SQL window semantics keep a NULL group; the
            # pandas default would silently drop those rows map-side
            state = (both.sort_values(["_hk", id_col], kind="mergesort")
                     .groupby(group_col, sort=False, dropna=False).head(k))
        if state is not None:
            yield state

    pre = scored.mapInPandas(
        local_topk, f"{group_col} {gtype}, {id_col} {itype}, _hk long")
    from pyspark.sql import Window
    w = (Window.partitionBy(group_col)
         .orderBy(F.col("_hk").asc(), F.col(id_col).asc()))
    return (pre.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(group_col, id_col, "rk"))


def token_budget_sample(df: DataFrame, budgets: dict[str, int],
                        id_col: str = "doc_id",
                        n_col: str = "n_tok",
                        group_col: str = "source",
                        seed: int = 0) -> DataFrame:
    """Downsample each source to a TOKEN budget: documents are taken in
    md5(seed, id) hash order — an unbiased, partitioning-independent
    shuffle that any engine reproduces — and a document is kept while
    the running token total (INCLUDING it) stays ≤ the source's budget.
    The standard corpus-construction primitive when mixtures are
    specified in tokens rather than epochs (``mixture_sample``) or
    fractions (``split_assign``).

    Prefix semantics: keep the MAXIMAL hash-ordered prefix whose
    running token total stays ≤ budget — the first overflowing
    document ends the prefix (running sums only grow, so the kept set
    is a clean prefix; no skip-and-refill second pass). Deterministic
    and oracle-exact; all arithmetic is int64 token counts, no floats
    anywhere. Sources absent from ``budgets`` are dropped (same
    convention as ``mixture_sample``'s zero weight). Adds
    ``cum_tokens`` (the kept row's running total).

    Plan shape: ONE shuffle — the per-source ordered running sum (a
    window partitioned by source); the budget map is a broadcast-sized
    literal CASE. At 10^12 rows the window is a sort per source,
    inherent to exact budgeting; if an approximate cut is acceptable,
    threshold the hash directly at budget/total_tokens instead (zero
    extra shuffles) — this operator is the exact path.
    """
    from pyspark.sql import Window
    if not budgets:
        raise ValueError("budgets is empty")
    clash = [c for c in ("_tb_hk", "_tb_budget", "cum_tokens")
             if c in df.columns]
    if clash:
        raise ValueError(
            f"column(s) {clash} already exist on the input — rename "
            "them (cum_tokens is this operator's output)")
    bad = {k: v for k, v in budgets.items() if int(v) < 0}
    if bad:
        raise ValueError(f"negative budgets: {bad}")
    hk = _unit_hash(seed, F.col(id_col))
    w = (Window.partitionBy(group_col)
         .orderBy("_tb_hk", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    bcol = F.create_map(*[x for k, v in sorted(budgets.items())
                          for x in (F.lit(k), F.lit(int(v)))])
    # a NULL count would ride along free (window sums skip nulls) and a
    # negative one would break the prefix invariant (running sums must
    # be monotone) — fail the job at the row instead of mis-sampling
    n_ok = F.assert_true(
        F.col(n_col).isNotNull() & (F.col(n_col) >= 0),
        F.concat(F.lit(f"token_budget_sample: {n_col} must be non-null"
                       f" and >= 0, got "),
                 # concat with a NULL operand is NULL and would erase
                 # the whole message for the null-count case
                 F.coalesce(F.col(n_col).cast("string"),
                            F.lit("NULL"))))
    return (df.withColumn("_tb_hk", hk)
            .withColumn("_tb_budget", bcol[F.col(group_col)])
            .filter(F.col("_tb_budget").isNotNull() & n_ok.isNull())
            .withColumn("cum_tokens",
                        F.sum(F.col(n_col).cast("long")).over(w))
            .filter(F.col("cum_tokens") <= F.col("_tb_budget"))
            .drop("_tb_hk", "_tb_budget"))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   seed: int = 0) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` training shards.

    The epoch-shuffle step every training pipeline needs before writing
    sequence shards: each row gets a ``shard`` and a ``pos`` (0-based
    dense position within its shard), such that reading shard 0, 1, ...
    in pos order is a reproducible pseudorandom permutation of the
    corpus. shard = md5(seed, id) mod n_shards — balanced in
    expectation, reproducible by any engine (no RNG state); within-shard
    order is the hash itself (ties broken by id, so duplicate-free
    inputs get a total order even on the 2^-60 hash collision).

    Scale shape: the assignment is map-only; the only shuffle is the
    per-shard window (ONE exchange keyed by shard). Shard cardinality is
    the operator's parallelism knob — at 100 TB you pick n_shards large
    enough (10^4-10^5) that a shard's rows fit an executor's sort
    spill comfortably; a global single-sequence permutation
    (ntile/row_number over everything) would be a one-partition sort and
    is exactly what this avoids. The epoch seed goes in the hash, so
    re-sharding for epoch 2 is a new seed, not a new algorithm.
    """
    if n_shards < 1:
        # pmod(x, 0) is NULL under non-ANSI Spark: every row would land
        # in ONE null window partition — the exact single-partition sort
        # this operator exists to avoid — with no error anywhere
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    key = _unit_hash(seed, F.col(id_col))
    from pyspark.sql import Window
    out = df.withColumn("_shuf", key) \
            .withColumn("shard", F.pmod(F.col("_shuf"),
                                        F.lit(n_shards)).cast("int"))
    w = Window.partitionBy("shard").orderBy(F.col("_shuf").asc(),
                                            F.col(id_col).asc())
    return (out.withColumn("pos", F.row_number().over(w) - 1)
            .drop("_shuf"))
