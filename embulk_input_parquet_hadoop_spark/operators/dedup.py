"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), MinHash + LSH banding, SimHash, and n-gram Jaccard —
all pure DataFrame API (shuffles on hash keys, broadcast-free, no UDFs), so
each scales as an ordinary aggregation/join at 1000-executor size. Hash
values are md5-derived so the DuckDB oracle can reproduce them exactly
(see functions/hashes.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import words


def exact_dup_stats(df: DataFrame, id_col: str, text_col: str,
                    group_col: str) -> DataFrame:
    """Per-group doc counts vs distinct-fingerprint counts (exact dedup)."""
    return (df.select(group_col, F.md5(F.col(text_col)).alias("fp"))
            .groupBy(group_col)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("fp").alias("n_unique")))


def doc_words(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, word) pairs, distinct per doc — the set representation."""
    return (df.select(id_col, F.explode(words(F.col(text_col)))
                      .alias("word")).distinct())


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       n_hashes: int = 4) -> DataFrame:
    """MinHash over the word set: h_i(doc) = min(md5(i || ':' || word)).

    Lexicographic min over md5 hex strings of a salted word is a valid
    min-wise hash family (md5 is uniform on hex strings). One shuffle:
    groupBy(id).
    """
    pairs = doc_words(df, id_col, text_col)
    aggs = [F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("word"))))
            .alias(f"h{i}") for i in range(n_hashes)]
    return pairs.groupBy(id_col).agg(*aggs)


def _band_rows(sigs: DataFrame, id_col: str,
               rows_per_band: int) -> DataFrame:
    """(band, bucket, id) rows: band keys as ONE inline explode over an
    array of (band, md5-bucket) structs — not a per-band union. A union
    plan re-evaluates the whole upstream signature pipeline (scan,
    shingle explode, groupBy) once per band: measured on q34's chain,
    the union shape scanned the corpus 10x with zero exchange reuse. The
    single-projection explode computes signatures once, and the explode
    itself is map-side (bands-per-row is a constant, no skew)."""
    hash_cols = [c for c in sigs.columns if c != id_col]
    bands = [hash_cols[i:i + rows_per_band]
             for i in range(0, len(hash_cols), rows_per_band)]
    structs = [F.struct(
        F.lit(i).alias("band"),
        F.md5(F.concat_ws("|", *[F.col(c) for c in cols])).alias("bucket"))
        for i, cols in enumerate(bands)]
    return (sigs.select(F.col(id_col),
                        F.explode(F.array(*structs)).alias("_bb"))
            .select(F.col("_bb.band").alias("band"),
                    F.col("_bb.bucket").alias("bucket"), id_col))


def lsh_band_groups(sigs: DataFrame, id_col: str, rows_per_band: int = 2,
                    min_docs: int = 2) -> DataFrame:
    """Band the signature columns; emit buckets holding >= min_docs docs.

    Candidate near-duplicate pairs are pairs within a bucket — the classic
    shingle -> minhash -> band -> bucket-join pipeline, as one keyed
    aggregation over the inline-exploded band rows.
    """
    allb = _band_rows(sigs, id_col, rows_per_band)
    return (allb.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.min(id_col).alias("min_id"),
                 F.max(id_col).alias("max_id"))
            .filter(F.col("n_docs") >= min_docs))


def lsh_candidate_pairs(sigs: DataFrame, id_col: str,
                        rows_per_band: int = 2,
                        max_bucket: int | None = None) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) from shared LSH band buckets.

    The pair-generation half of the classic minhash-LSH pipeline: docs
    sharing ANY band bucket become a candidate. Within-bucket pairing is a
    self-equi-join on (band, bucket) — shuffle-partitionable, never
    all-pairs. ``max_bucket`` drops over-full buckets before pairing
    (standard LSH hygiene, same reasoning as ``ngram_jaccard_pairs``'s
    ``max_df``): a bucket holding f docs alone contributes f^2/2 pairs,
    and a bucket that large is boilerplate collision, not near-duplicate
    signal.
    """
    allb = _band_rows(sigs, id_col, rows_per_band)
    if max_bucket is not None:
        allb = (allb.withColumn(
            "_bn", F.count(F.lit(1)).over(
                Window.partitionBy("band", "bucket")))
            .filter(F.col("_bn") <= max_bucket).drop("_bn"))
    a = allb.select("band", "bucket", F.col(id_col).alias("id_a"))
    b = allb.select("band", "bucket", F.col(id_col).alias("id_b"))
    return (a.join(b, ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def _gram_text_array(df: DataFrame, id_col: str, text_col: str,
                     k: int) -> tuple[DataFrame, "F.Column"]:
    """(ws_df, grams): ``ws_df`` materializes the word array as a real
    ``_ws`` column, ``grams`` is the k-word-window gram-string array
    expression OVER that column (array index j = 1-based word position
    j+1).

    The caller MUST apply a generator (explode/posexplode of ``grams``
    or an expression composed from it) DIRECTLY on ``ws_df`` — the
    generator is what stops Catalyst collapsing the ``_ws`` projection
    into the gram lambda. Returning a pre-projected grams DataFrame
    instead puts two adjacent Projects in the plan, Catalyst fuses them
    to ``transform(words(text), ...)``, and every ``element_at`` inside
    the lambda re-evaluates the full split/filter: O(len^2) per doc
    (first measured 6x wall on the sf0.1 corpus; the tuple shape
    re-regressed q12 12.8s / q40 10.8s when briefly flattened in r5 —
    do not "simplify" this into one DataFrame).
    """
    ws_df = df.select(id_col, words(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    # guard: Spark sequence(1, 0) DESCENDS; short docs need an empty array
    idx = F.when(F.size(ws) >= k,
                 F.sequence(F.lit(1), F.size(ws) - (k - 1))
                 ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j).cast("int"))
                   for j in range(k)]))
    return ws_df, grams


def word_shingles(df: DataFrame, id_col: str, text_col: str,
                  k: int = 3) -> DataFrame:
    """(id, shingle) pairs of k-word shingles, distinct per doc."""
    ws_df, grams = _gram_text_array(df, id_col, text_col, k)
    return (ws_df.select(id_col, F.explode(grams).alias("shingle"))
            .distinct())


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str,
                        k: int = 3, threshold: float = 0.2,
                        max_df: int | None = None,
                        candidates: DataFrame | None = None,
                        max_pairs: int | None = 50_000_000) -> DataFrame:
    """All-pairs n-gram Jaccard via shingle inverted index.

    join on shingle -> per-pair intersection counts -> union by
    inclusion-exclusion. Counts are exact integers; jaccard is a single
    division, rounded at the caller. At scale, feed this the LSH candidate
    pairs instead of the full inverted index.

    ``max_df`` drops shingles appearing in more than that many documents
    *before* the self-join (standard inverted-index hygiene): one
    boilerplate shingle shared by f documents alone contributes f^2/2
    candidate pairs, so without the cap a single hot shingle makes the
    join quadratic in corpus size. Set sizes are computed on the capped
    shingle sets, so the jaccard stays a consistent inclusion-exclusion
    on the filtered universe.

    Plan shape (VERDICT r2 #4 — the r2 version ``persist()``-ed the
    shingle set and leaked the cache for the session's lifetime): the
    document-frequency cap and the per-doc set sizes are *window*
    aggregates carried inline on the shingle rows instead of separate
    aggregate-and-rejoin branches. One linear pipeline — no cached
    intermediate, no lifetime to manage — and the self-join's two sides
    are the identical subplan, which Spark reuses as a single exchange
    (ReusedExchange; the r2 four-branch plan defeated that reuse because
    each branch pruned different columns below the exchange). ``sz``
    rides through the join and is functionally determined by the id, so
    the final aggregation reads it with ``first`` instead of two extra
    size-joins.

    ``candidates`` ((id_a, id_b) DataFrame, e.g. from
    ``lsh_candidate_pairs``) restricts the exact-jaccard computation to
    those pairs — the LSH -> verify pipeline that replaces the full
    inverted-index self-join at scale: the shingle join then touches only
    docs appearing in some candidate pair, and the pair space is the
    candidate set, not shingle co-occurrence.

    ``max_pairs`` (full-self-join path only): fail-fast guardrail — one
    cheap keyed aggregation computes the exact candidate-pair count
    (sum over shingles of f*(f-1)/2 on the capped index) BEFORE the
    quadratic join runs, and raises past the bound. This operator is the
    documented exact BASELINE (the standing wall-time tail at sf0.1);
    an accidental invocation at 100x the intended corpus must refuse in
    seconds, not run for hours — ``minhash_jaccard_dedup`` is the scale
    path. ``None`` disables the pre-count (and its one extra job).
    """
    sh = word_shingles(df, id_col, text_col, k)
    if max_df is not None:
        sh = (sh.withColumn("_df", F.count(F.lit(1)).over(
                  Window.partitionBy("shingle")))
              .filter(F.col("_df") <= max_df).drop("_df"))
    sh = sh.withColumn("sz", F.count(F.lit(1)).over(
        Window.partitionBy(id_col)))
    if candidates is not None:
        cand = candidates.select("id_a", "id_b")
        a = sh.select(F.col(id_col).alias("id_a"), "shingle",
                      F.col("sz").alias("sz_a"))
        b = sh.select(F.col(id_col).alias("id_b"), "shingle",
                      F.col("sz").alias("sz_b"))
        inter = (cand.join(a, "id_a")
                 .join(b, ["id_b", "shingle"])
                 .groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("inter"),
                      F.first("sz_a").alias("sz_a"),
                      F.first("sz_b").alias("sz_b")))
    else:
        if max_pairs is not None:
            est = (sh.groupBy("shingle")
                   .agg(F.count(F.lit(1)).alias("f"))
                   .agg(F.sum(F.col("f") * (F.col("f") - 1) / 2)
                        .alias("p"))
                   .collect()[0]["p"])
            if est is not None and int(est) > max_pairs:
                raise ValueError(
                    f"ngram_jaccard_pairs: inverted-index self-join would "
                    f"generate ~{int(est)} candidate pairs > max_pairs="
                    f"{max_pairs}. This exact all-pairs operator is the "
                    f"small-scale baseline; use minhash_jaccard_dedup "
                    f"(LSH->verify) at this corpus size, tighten max_df, "
                    f"or raise max_pairs explicitly.")
        a = sh.select(F.col(id_col).alias("id_a"), "shingle",
                      F.col("sz").alias("sz_a"))
        b = sh.select(F.col(id_col).alias("id_b"), "shingle",
                      F.col("sz").alias("sz_b"))
        inter = (a.join(b, "shingle")
                 .filter(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b")
                 .agg(F.count(F.lit(1)).alias("inter"),
                      F.first("sz_a").alias("sz_a"),
                      F.first("sz_b").alias("sz_b")))
    return (inter
            .withColumn("jaccard",
                        F.round(F.col("inter") /
                                (F.col("sz_a") + F.col("sz_b")
                                 - F.col("inter")), 4))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "inter", "jaccard"))


def simhash(df: DataFrame, id_col: str, text_col: str,
            bits: int = 16) -> DataFrame:
    """SimHash over the word multiset: 16-bit md5-derived fingerprint.

    ONE keyed aggregation: per document, ``bits`` bit-population sums as
    separate agg columns (vote s_b = 2*sum_b - n, bit set iff 2*sum_b > n)
    — no bits-fold row explosion and one shuffle instead of two (the r1
    plan exploded every word x 16 bit positions; at 100 TB that 16x'd the
    shuffle for no information gain). Arithmetic stays in exact integer
    range (h < 2^16), so the DuckDB oracle reproduces it verbatim.
    """
    w = df.select(id_col, F.explode(words(F.col(text_col))).alias("word"))
    h = w.withColumn(
        "h", F.conv(F.substring(F.md5("word"), 1, 4), 16, 10).cast("long"))
    bit_sums = [F.sum(F.shiftright(F.col("h"), b) % 2).alias(f"_s{b}")
                for b in range(bits)]
    agg = h.groupBy(id_col).agg(F.count(F.lit(1)).alias("_n"), *bit_sums)
    sim = None
    for b in range(bits):
        term = F.when(2 * F.col(f"_s{b}") > F.col("_n"),
                      F.lit(1 << b)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return agg.select(id_col, sim.cast("long").alias("simhash"))


def minhash_jaccard_dedup(df: DataFrame, id_col: str, text_col: str,
                          k: int = 3, n_hashes: int = 4,
                          rows_per_band: int = 2,
                          threshold: float = 0.2,
                          max_bucket: int | None = None,
                          max_df: int | None = None) -> DataFrame:
    """The full industrial near-dup pipeline in one call:
    shingle -> minhash -> LSH band buckets -> candidate pairs -> exact
    n-gram jaccard verification on candidates only.

    This is the shape that runs at 100 TB: every stage is an equi-join or
    keyed aggregation (no all-pairs anywhere), the quadratic risks are
    capped (``max_bucket`` for hot LSH buckets, ``max_df`` for hot
    shingles), and the expensive exact-jaccard only touches pairs LSH
    proposed. Recall < 1 by the standard LSH trade (pairs missed by every
    band are never verified); raise ``n_hashes``/lower ``rows_per_band``
    to trade compute for recall.
    """
    sigs = minhash_signatures(df, id_col, text_col, n_hashes)
    cand = lsh_candidate_pairs(sigs, id_col, rows_per_band, max_bucket)
    return ngram_jaccard_pairs(df, id_col, text_col, k, threshold,
                               max_df=max_df, candidates=cand)


def contamination_report(train: DataFrame, bench: DataFrame, id_col: str,
                         text_col: str, source_col: str,
                         k: int = 5) -> DataFrame:
    """Test-set decontamination: per-source counts of training documents
    that share at least one k-word shingle with a benchmark corpus.

    The standard pre-training hygiene pass (the reference plugin has no
    analogue — this is an LLM-pipeline addition): benchmark/eval text
    must not leak into training data, and the industry-standard detector
    is exact n-gram overlap. Shape at 100 TB: the benchmark side is tiny
    (eval suites are MBs), so its distinct shingle set is **broadcast**
    and the probe over the training corpus is a map-side hash join — zero
    shuffle for the scan; the only shuffles are the per-doc hit count and
    the per-source rollup, both keyed aggregations. For a benchmark too
    large to broadcast, drop the ``broadcast()`` hint and Spark falls
    back to a shuffle equi-join on the shingle — same semantics.

    Returns (source, n_flagged, n_gram_hits): documents flagged and total
    distinct contaminated shingles per source. Use ``contaminated_ids``
    for the id set to subtract from the corpus.
    """
    hits = contaminated_ids(train, bench, id_col, text_col, k)
    return (hits.join(train.select(id_col, source_col), id_col)
            .groupBy(source_col)
            .agg(F.count(F.lit(1)).alias("n_flagged"),
                 F.sum("n_gram_hits").alias("n_gram_hits")))


def contaminated_ids(train: DataFrame, bench: DataFrame, id_col: str,
                     text_col: str, k: int = 5) -> DataFrame:
    """(id, n_gram_hits) for every training doc sharing >=1 k-word
    shingle with ``bench``. See ``contamination_report`` for the plan
    shape; this is the subtractable id set (anti-join it against the
    corpus to decontaminate)."""
    train_g = word_shingles(train, id_col, text_col, k)
    bench_g = (word_shingles(bench, id_col, text_col, k)
               .select("shingle").distinct())
    return (train_g.join(F.broadcast(bench_g), "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_gram_hits")))


def _numpy_cc(u: "np.ndarray", w: "np.ndarray") -> "np.ndarray":
    """Min-label connected components over a symmetric edge list of
    0..V-1 indexes, fully vectorized: alternate one edge-relax pass
    (``np.minimum.at``) with pointer-jumping compression (``lbl[lbl]``)
    until every edge is label-consistent. O((E+V) log V) worst case, a
    few passes in practice."""
    import numpy as np

    n_v = int(max(int(u.max()), int(w.max()))) + 1 if len(u) else 0
    lbl = np.arange(n_v, dtype=np.int64)
    while True:
        np.minimum.at(lbl, u, lbl[w])
        while True:
            nl = lbl[lbl]
            if np.array_equal(nl, lbl):
                break
            lbl = nl
        if np.all(lbl[u] == lbl[w]):
            return lbl


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 30,
                         driver_max_edges: int = 1_000_000
                         ) -> DataFrame:
    """Distributed connected components by min-label propagation:
    (v, component) where component is the smallest vertex id in v's
    component — the step that turns dedup CANDIDATE PAIRS (LSH bands,
    SRP buckets, shared fingerprints) into duplicate CLUSTERS with a
    canonical representative per cluster (keep min id, drop the rest).

    Each round every vertex takes the min of its own label and its
    neighbors' labels — one equi-join + one aggregation per round,
    converging in O(component diameter) rounds (near-dup clusters are
    stars/cliques: 2-4). Convergence is detected by the total label sum,
    which strictly decreases until fixpoint (labels are monotone
    non-increasing), so the per-round action is a cheap aggregate, not a
    diff join. Two job-count levers matter here because every Spark job
    on this class of iterative graph loop is dominated by fixed
    scheduling cost, not data:

    - **Round 1 is a groupBy, not a join.** With identity initial labels
      the neighbor-min of v is simply min(w over sym[u=v]), so the first
      round skips the join entirely.
    - **Lazy ``localCheckpoint(eager=False)``** truncates the
      self-referential lineage (which otherwise grows exponentially in
      Catalyst) while letting the convergence-sum action materialize the
      checkpoint — one job per round where the eager form pays two.

    On a cluster with unreliable executors, use ``spark.sparkContext.
    setCheckpointDir`` + ``checkpoint()`` instead — documented trade:
    localCheckpoint is faster but not fault-tolerant.

    Vertex ids must be numeric (the component id IS a vertex id); raises
    if propagation hasn't converged after ``max_iter`` rounds (a
    diameter that large means the input is not dedup-shaped).

    **Size-gated driver fast path**: when the materialized edge set is
    within ``driver_max_edges`` (counted on the already-checkpointed
    edges — one cheap action), the closure runs as a vectorized numpy
    union (:func:`_numpy_cc`) on the driver instead of the iterative
    loop. Same bounded-driver-materialization discipline as
    ``ivf_build``'s training sample: the default 1M edges is ~16 MB over
    the ~17-40 MB/s JVM->Python channel, well under a second, vs 1-4
    Spark jobs of pure scheduling overhead for the loop. Past the gate —
    the 100 TB case where the candidate-pair set itself is huge — the
    distributed loop runs unchanged. Set ``driver_max_edges=0`` to force
    the loop.
    """
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
           .union(edges.select(F.col(dst).alias("u"),
                               F.col(src).alias("w")))
           .distinct()
           # materialize ONCE: every propagation round joins against
           # sym, and without this each round re-runs the whole
           # upstream candidate-pair pipeline (measured 30s -> ~5s on
           # the sf0.1 winnow edges)
           .localCheckpoint())
    n_sym = sym.count() if driver_max_edges else 0
    if 0 < n_sym <= 2 * driver_max_edges:
        import numpy as np
        import pandas as pd

        tbl = sym.toArrow()
        un = tbl.column("u").to_numpy()
        wn = tbl.column("w").to_numpy()
        ids = np.unique(np.concatenate([un, wn]))
        lbl = _numpy_cc(np.searchsorted(ids, un), np.searchsorted(ids, wn))
        # np.unique sorts, so index order == id order and the min-index
        # label maps back to the min-id component representative
        out = pd.DataFrame({"v": ids, "component": ids[lbl]})
        # explicit schema matching the distributed path: v/component carry
        # the src column's type (both paths' ids ARE input vertex ids), so
        # downstream schema-sensitive consumers see one contract
        # regardless of which gate fired
        id_type = edges.schema[src].dataType
        from pyspark.sql.types import StructField, StructType
        schema = StructType([StructField("v", id_type, True),
                             StructField("component", id_type, True)])
        return edges.sparkSession.createDataFrame(out, schema=schema)
    # decimal(38,0) sum: an int64 sum of 10^12 vertex ids would overflow
    _lsum = F.sum(F.col("lbl").cast("decimal(38,0)"))
    # round 1 fused: labels start as identity, so min(self, neighbors)
    # is one keyed aggregation over sym — no join, no identity table
    labels = (sym.groupBy("u").agg(F.min("w").alias("_mw"))
              .select(F.col("u").alias("v"),
                      F.least(F.col("u"), F.col("_mw")).alias("lbl"))
              .localCheckpoint(eager=False))
    prev_sum = labels.agg(_lsum).collect()[0][0]
    if prev_sum is None:
        return labels.select("v", F.col("lbl").alias("component"))
    for _ in range(max_iter):
        nbr = (sym.join(labels, sym.w == labels.v)
               .groupBy("u").agg(F.min("lbl").alias("nl")))
        labels = (labels.join(nbr, labels.v == nbr.u, "left")
                  .select(labels.v,
                          F.least(F.col("lbl"),
                                  F.coalesce("nl", F.col("lbl")))
                          .alias("lbl"))
                  .localCheckpoint(eager=False))
        cur_sum = labels.agg(_lsum).collect()[0][0]
        if cur_sum == prev_sum:
            return labels.select("v", F.col("lbl").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds")


def keep_canonical(docs: DataFrame, components: DataFrame,
                   id_col: str = "doc_id",
                   order_col: str = "n_chars") -> DataFrame:
    """Collapse near-duplicate clusters to ONE representative each:
    keep, per component, the document with the largest ``order_col``
    (ties -> smallest id), drop the rest, and pass every unclustered
    document through untouched — the corpus-shrinking step that turns
    :func:`connected_components` output into a deduplicated corpus.

    Scale shape: ``components`` is O(clustered docs), typically orders
    of magnitude smaller than the corpus. The keeper choice is one
    window over it (shuffle keyed by component, bounded by cluster
    count) and the corpus filter is a LEFT ANTI join against the
    DROPPED id set — smaller still (clustered minus keepers), so AQE
    broadcasts it and the full corpus scan stays shuffle-free. The
    big table is never shuffled.
    """
    from pyspark.sql import Window

    ranked = (components
              .join(docs.select(F.col(id_col).alias("v"),
                                F.col(order_col).alias("_ord")), "v")
              .withColumn("_rk", F.row_number().over(
                  Window.partitionBy("component")
                  .orderBy(F.col("_ord").desc(), F.col("v").asc()))))
    dropped = ranked.filter(F.col("_rk") > 1) \
        .select(F.col("v").alias(id_col))
    return docs.join(dropped, on=id_col, how="left_anti")


def duplicate_spans(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5, min_count: int = 2) -> DataFrame:
    """Exact duplicate-substring spans at k-word-gram granularity
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better" — the ExactSubstr variant, on the repo's WORDS
    tokenization instead of a suffix array).

    Every k-word window whose exact text occurs at least ``min_count``
    times in the corpus — EXCEPT the globally first occurrence, ordered
    by (id, position) — is a duplicate span ``[pos, pos+k-1]`` (1-based
    word positions). ``min_count`` (default 2 = any repetition) is the
    frequency floor: raise it to excise only heavily-boilerplate
    passages while tolerating a handful of legitimate repeats.
    Overlapping and ADJACENT spans within a document merge (adjacent
    word ranges are contiguous text), so a long repeated passage comes
    back as ONE span, not len-k+1 of them. Returns
    ``(id_col, span_start, span_end)`` — callers redact, drop, or
    aggregate. A document with no duplicated window yields no rows.

    Scale shape (no all-pairs anywhere):
    - gram extraction is map-side (the word array is materialized in
      its own projection first — the HOF-lambda CSE rule — and each
      gram hashes k ``element_at`` lookups, O(k·len) per doc);
    - the first-occurrence choice is ONE keyed aggregation
      ``min(struct(id, pos))`` over gram hash — map-side combine makes
      a corpus-wide hot gram (boilerplate repeated 10^6 times) safe;
      the join back is an equi-join whose output is the occurrence
      rows themselves (linear);
    - span merging is a per-document window (gaps-and-islands),
      bounded by document length.

    Gram identity is the md5-derived 60-bit int (functions/hashes) so a
    DuckDB oracle reproduces spans exactly.
    """
    occ = _gram_occurrences(df, id_col, text_col, k)
    firsts = (occ.groupBy("h")
              .agg(F.min(F.struct(F.col(id_col).alias("i"),
                                  F.col("pos").alias("p"))).alias("_f"),
                   F.count(F.lit(1)).alias("_cnt"))
              .filter(F.col("_cnt") >= max(int(min_count), 2)))
    dups = (occ.join(firsts, "h")
            .filter(~((F.col(id_col) == F.col("_f.i"))
                      & (F.col("pos") == F.col("_f.p"))))
            .select(id_col, F.col("pos").alias("s"),
                    (F.col("pos") + (k - 1)).alias("e")))
    return _merge_spans(dups, id_col)


def _gram_occurrences(df: DataFrame, id_col: str, text_col: str,
                      k: int) -> DataFrame:
    """(id, pos, h): every k-word window's md5-derived 60-bit hash with
    its 1-based word position. Map-side; shares the CSE-safe gram
    scaffolding with :func:`word_shingles` (see _gram_text_array)."""
    from ..functions.hashes import md5_long

    ws_df, grams = _gram_text_array(df, id_col, text_col, k)
    # explicit 1-arg lambda: md5_long(col, hex_chars=15) has two
    # parameters, and F.transform would bind hex_chars to the ELEMENT
    # INDEX (the (x, i) lambda form), silently varying the hash width
    hashed = F.transform(grams, lambda gr: md5_long(gr))
    return (ws_df.select(id_col, F.posexplode(hashed).alias("_p0", "h"))
            .select(id_col, (F.col("_p0") + 1).alias("pos"), "h"))


def _merge_spans(spans: DataFrame, id_col: str) -> DataFrame:
    """Gaps-and-islands merge of (id, s, e) word ranges: overlapping OR
    adjacent ranges coalesce. Per-document window, bounded by doc length."""
    w = Window.partitionBy(id_col).orderBy("s")
    prev_max_e = F.max("e").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    out = spans.withColumn(
        "_ni", F.when(F.col("s") > F.coalesce(prev_max_e, F.lit(-2)) + 1,
                      F.lit(1)).otherwise(F.lit(0)))
    out = out.withColumn(
        "_gid", F.sum("_ni").over(w.rowsBetween(
            Window.unboundedPreceding, 0)))
    return (out.groupBy(id_col, "_gid")
            .agg(F.min("s").alias("span_start"),
                 F.max("e").alias("span_end"))
            .select(id_col, "span_start", "span_end"))


def contaminated_spans(train: DataFrame, bench: DataFrame, id_col: str,
                       text_col: str, k: int = 5) -> DataFrame:
    """Spans of training documents whose k-word window appears ANYWHERE
    in the benchmark corpus — decontamination by EXCISION: feed the
    result to :func:`remove_duplicate_spans` to scrub the overlapping
    passages while keeping the rest of each document (the
    whole-document alternative is :func:`contaminated_ids` + anti-join).

    Plan shape mirrors :func:`contamination_report`: the benchmark gram
    set is tiny (eval suites are MBs) and **broadcast**, so the corpus
    probe is a map-side hash join — zero scan shuffle; the island merge
    is the per-doc window. Same gram identity as
    :func:`duplicate_spans`, so one DuckDB oracle covers both."""
    occ = _gram_occurrences(train, id_col, text_col, k)
    bench_h = (_gram_occurrences(bench, id_col, text_col, k)
               .select("h").distinct())
    hits = (occ.join(F.broadcast(bench_h), "h")
            .select(id_col, F.col("pos").alias("s"),
                    (F.col("pos") + (k - 1)).alias("e")))
    return _merge_spans(hits, id_col)


def remove_duplicate_spans(docs: DataFrame, spans: DataFrame,
                           id_col: str, text_col: str,
                           out_col: str = "text_dedup") -> DataFrame:
    """Apply :func:`duplicate_spans` output to the corpus: rebuild each
    document's text with every duplicated span's words removed (the
    Lee et al. 2022 ExactSubstr REMOVAL step — the first occurrence
    stays, later copies vanish; a wholly-duplicated document becomes
    the empty string, not a dropped row, so corpus accounting stays
    exact).

    Plan shape: spans collapse to ONE array column per affected doc
    (keyed agg, bounded by span count), broadcast-or-shuffle LEFT join
    back to the corpus (only affected docs carry an array), then a
    map-side indexed ``filter`` HOF keeps word i unless some span
    covers it — O(len · n_spans_doc) per doc, no explode of the corpus
    words through a shuffle. The word array and span array are
    materialized as real columns first (HOF-lambda CSE rule).
    """
    sp = (spans.groupBy(id_col)
          .agg(F.collect_list(F.struct(
              F.col("span_start").alias("s"),
              F.col("span_end").alias("e"))).alias("_spans")))
    ws_df = (docs.withColumn("_ws", words(F.col(text_col)))
             .join(sp, on=id_col, how="left"))
    kept = F.filter(
        F.col("_ws"),
        lambda w, i: ~F.exists(
            F.col("_spans"),
            lambda sp_: (sp_["s"] <= i + 1) & (i + 1 <= sp_["e"])))
    out = F.when(F.col("_spans").isNull(), F.col(text_col)) \
        .otherwise(F.concat_ws(" ", kept))
    return ws_df.withColumn(out_col, out).drop("_ws", "_spans")
