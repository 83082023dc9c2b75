"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting — all built-in-function DataFrame ops (JVM-side,
whole-stage-codegen), each reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashes import words

# tiny trigram/stopword tables for the heuristic language guesser; the
# point is the *operator shape* (set-membership ratios, argmax), not NLP
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
}


def token_count(text: Column) -> Column:
    return F.size(words(text))


def lang_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Per-doc marker-hit counts per language + argmax prediction."""
    ws = words(F.col(text_col))
    out = df
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(
            ws, lambda w: w.isin(markers)))  # noqa: B023
        out = out.withColumn(f"hits_{lang}", hits)
    # deterministic argmax: highest hits, ties broken by lang name order
    pred = F.lit("unk")
    best = F.lit(-1)
    for lang in sorted(LANG_MARKERS):
        better = F.col(f"hits_{lang}") > best
        pred = F.when(better, F.lit(lang)).otherwise(pred)
        best = F.when(better, F.col(f"hits_{lang}")).otherwise(best)
    return out.withColumn("lang_pred",
                          F.when(best <= 0, F.lit("unk")).otherwise(pred))


def quality_features(df: DataFrame, text_col: str) -> DataFrame:
    """Length / distinct-ratio / mean-word-length quality features + score.

    All ratios are exact integer divisions in double, so per-doc values are
    bit-reproducible across engines.
    """
    ws = words(F.col(text_col))
    n_words = F.size(ws)
    n_distinct = F.size(F.array_distinct(ws))
    n_chars = F.length(F.col(text_col))
    mean_wlen = F.when(n_words > 0,
                       (n_chars - (n_words - 1)) / n_words).otherwise(0.0)
    distinct_ratio = F.when(n_words > 0,
                            n_distinct / n_words).otherwise(0.0)
    score = F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
        + distinct_ratio * 0.5, 4)
    return (df.withColumn("n_words", n_words)
              .withColumn("n_distinct", n_distinct)
              .withColumn("distinct_ratio", F.round(distinct_ratio, 4))
              .withColumn("mean_wlen", F.round(mean_wlen, 4))
              .withColumn("quality", score))


def _tmp_names(df: DataFrame, *bases: str) -> list[str]:
    """Scratch column names guaranteed absent from ``df.columns`` — a user
    DataFrame that already carries a ``_tng_sng`` (etc.) column must not
    have it silently overwritten and dropped."""
    taken = set(df.columns)
    out = []
    for base in bases:
        name, i = base, 0
        while name in taken:
            i += 1
            name = f"{base}_{i}"
        taken.add(name)
        out.append(name)
    return out


def _with_top_ngram_frac(df: DataFrame, ws_col: str, k: int,
                         out_name: str) -> DataFrame:
    """Append ``out_name``: fraction of words covered by the most frequent
    *repeated* k-gram (0.0 when no k-gram occurs twice — a singleton top
    gram is not repetition, and in a short doc its 2/n "fraction" would
    exceed any threshold). O(n log n) per doc: sort the grams, then the
    top frequency is the longest run of equal adjacent elements —
    boundary positions where a new gram starts, max gap between
    consecutive boundaries. No shuffle, no UDF.

    Every intermediate array lands as a REAL column (its own projection
    step), and ``ws_col`` must be a materialized column too. This is
    load-bearing, not style: a non-attribute subtree referenced from
    inside a higher-order-function lambda is re-evaluated PER ELEMENT
    (neither codegen CSE nor interpreted subexpression elimination
    reaches into lambda bodies), so the inline-``Column`` version of
    this function — identical algebra, no named steps — cost O(n^2 log n)
    per doc: measured 810 s for 500 tiny docs at sf0.001. With named
    steps each array is computed once per row and the lambdas only read
    attributes. Catalyst's CollapseProject keeps the steps separate
    (each intermediate is referenced more than once downstream, and
    CollapseProject refuses to duplicate non-cheap expressions)."""
    ws = F.col(ws_col)
    n_words = F.size(ws)
    m = n_words - (k - 1)
    c_sng, c_bounds, c_ends, c_top = _tmp_names(
        df, "_tng_sng", "_tng_bounds", "_tng_ends", "_tng_top")
    idx = (F.when(m >= 1, F.sequence(F.lit(1), m))
           .otherwise(F.array().cast("array<int>")))
    ng = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j).cast("int")) for j in range(k)]))
    d = df.withColumn(c_sng, F.array_sort(ng))
    sng = F.col(c_sng)
    idx2 = (F.when(F.size(sng) >= 1, F.sequence(F.lit(1), F.size(sng)))
            .otherwise(F.array().cast("array<int>")))
    # F.get is 0-based and NULL-safe: at i=1 the i-2 lookup is out of
    # range -> NULL inequality -> the (i == 1) arm keeps the boundary
    d = d.withColumn(c_bounds, F.filter(
        idx2, lambda i: (i == 1) | (F.get(sng, i - 1) != F.get(sng, i - 2))))
    d = d.withColumn(c_ends,
                     F.concat(F.col(c_bounds),
                              F.array(F.size(sng) + 1)))
    ends = F.col(c_ends)
    d = d.withColumn(c_top, F.array_max(F.zip_with(
        F.slice(ends, 1, F.size(ends) - 1),
        F.slice(ends, 2, F.size(ends) - 1),
        lambda a, b: b - a)))
    top = F.col(c_top)
    frac = F.when((m >= 1) & (top >= 2),
                  F.lit(k) * top / n_words).otherwise(0.0)
    return (d.withColumn(out_name, frac)
            .drop(c_sng, c_bounds, c_ends, c_top))


def repetition_features(df: DataFrame, text_col: str) -> DataFrame:
    """Gopher-style repetition filters (Rae et al. 2021, appendix A1.1):
    duplicate-word fraction plus the fraction of words covered by the most
    frequent bigram / trigram, and the combined ``repetitive`` flag at
    Gopher's published n-gram thresholds (top-2-gram 0.20, top-3-gram
    0.18; the corpus has no line structure, so the 0.30 duplicate-line
    gate is applied to duplicate words instead).

    Everything is built-in higher-order functions over the word array —
    map-only, whole-stage-codegen, zero shuffles — so at 100 TB this is an
    embarrassingly parallel scan: the canonical pre-training quality pass.
    Each fraction is a single integer division (or ``k * top / n``), so the
    per-doc doubles are bit-reproducible in the DuckDB oracle.
    """
    (c_ws,) = _tmp_names(df, "_rep_ws")
    d = df.withColumn(c_ws, words(F.col(text_col)))
    ws = F.col(c_ws)
    n = F.size(ws)
    d = d.withColumn("dup_word_frac", F.when(
        n > 0, 1 - F.size(F.array_distinct(ws)) / n).otherwise(0.0))
    d = _with_top_ngram_frac(d, c_ws, 2, "top_bigram_frac")
    d = _with_top_ngram_frac(d, c_ws, 3, "top_trigram_frac")
    return (d.drop(c_ws)
              .withColumn("repetitive",
                          (F.col("dup_word_frac") > 0.30)
                          | (F.col("top_bigram_frac") > 0.20)
                          | (F.col("top_trigram_frac") > 0.18)))


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercased, space-collapsed text.

    (The rolling-hash variant lives in dedup.simhash; this is the exact-
    match fingerprint used for dedup clustering.)
    """
    return F.md5(F.regexp_replace(F.lower(text), " +", " "))


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str,
                        k: int = 4, w: int = 5) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., the MOSS
    scheme, simplified to distinct per-window minima): rolling k-gram
    hash -> min over every w-window -> distinct (doc, fingerprint).

    The rolling-hash fingerprint family the reference-era pipelines use
    for near-copy detection at corpus scale: two documents sharing any
    run of >= w+k-1 words share a fingerprint, so candidate pairs come
    from an equi-join on ``fp`` — never an all-pairs scan. Hashes are
    md5-derived (32-bit prefix), reproducible in the DuckDB oracle.

    One shuffle (window by doc) + one distinct; the word array is
    materialized behind the explode barrier (see ``dedup.word_shingles``
    for why inlining it is O(len^2) per doc).
    """
    from pyspark.sql import Window

    ws_df = df.select(id_col, words(F.col(text_col)).alias("_ws"))
    ws = F.col("_ws")
    n_sh = F.size(ws) - (k - 1)
    idx = F.when(n_sh >= 1, F.sequence(F.lit(1), n_sh)) \
        .otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx, lambda i: F.concat_ws(
            " ", *[F.element_at(ws, (i + j).cast("int"))
                   for j in range(k)]))
    sh = ws_df.select(id_col, F.posexplode(shingle).alias("pos", "shingle"))
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    win = (Window.partitionBy(id_col).orderBy("pos")
           .rowsBetween(Window.currentRow, w - 1))
    m = sh.select(F.col(id_col), F.min(h).over(win).alias("fp"),
                  F.count(F.lit(1)).over(win).alias("_n"))
    return m.filter(F.col("_n") == w).select(id_col, "fp").distinct()


def filter_corpus(df: DataFrame, text_col: str = "text",
                  min_words: int = 5, max_words: int = 100_000,
                  langs: tuple[str, ...] = ("en",),
                  max_dup_word_frac: float = 0.30,
                  min_distinct_ratio: float = 0.10) -> DataFrame:
    """One-call corpus cleaning: compose the individual quality signals
    (length, language, Gopher duplicate-word fraction, lexical diversity)
    into a ``keep`` flag plus a ``drop_reason`` — the FIRST failing rule
    in a fixed order (too_short, too_long, bad_lang, repetitive,
    low_diversity; else 'kept'), so every dropped doc has exactly one
    attributed cause and the reason histogram is deterministic.

    Entirely built-in expressions — map-only, whole-stage-codegen, zero
    shuffles: at 100 TB this is one embarrassingly parallel scan emitting
    the cleaned corpus and its audit trail in the same pass. Each ratio
    is a single integer division in double, so thresholds compare
    bit-identically in the DuckDB oracle.
    """
    base = lang_scores(df, text_col)
    ws = words(F.col(text_col))
    n = F.size(ws)
    nd = F.size(F.array_distinct(ws))
    dup = F.when(n > 0, 1 - nd / n).otherwise(0.0)
    dr = F.when(n > 0, nd / n).otherwise(0.0)
    reason = (F.when(n < min_words, F.lit("too_short"))
              .when(n > max_words, F.lit("too_long"))
              .when(~F.col("lang_pred").isin(*langs), F.lit("bad_lang"))
              .when(dup > max_dup_word_frac, F.lit("repetitive"))
              .when(dr < min_distinct_ratio, F.lit("low_diversity"))
              .otherwise(F.lit("kept")))
    return (base.withColumn("drop_reason", reason)
            .withColumn("keep", F.col("drop_reason") == "kept")
            .drop(*[f"hits_{lang}" for lang in LANG_MARKERS]))


def word_commonness(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    ppm_scale: int = 1_000_000) -> DataFrame:
    """Per-document mean word-commonness: a unigram-LM quality score.

    For every word, its corpus frequency in ppm (integer floor division —
    exact in any engine); per document, the mean ppm of its words,
    again integer floor. Low scores mark documents dominated by corpus-rare
    words (OCR noise, codes, boilerplate IDs) — the standard cheap
    perplexity proxy a quality filter thresholds on. Integer end to end:
    no float log, so the DuckDB oracle matches bit-for-bit (CLAUDE.md
    parity conventions; Spark's ``DIV`` truncates toward zero while
    DuckDB's ``//`` floors — identical here because every operand,
    counts and ppm sums, is non-negative).

    Plan shape at 10^12 rows: explode is map-side; the word-frequency
    aggregation is ONE shuffle with map-side partial aggregation over a
    vocab-bounded key space; the corpus total folds off that same
    aggregate (O(vocab) input); frequencies re-join the exploded scan as
    a broadcast (a natural-language vocab is millions of rows at
    corpus scale — far under broadcast limits); the per-document mean is
    the second and last shuffle, on the document key.

    Returns (id_col, n_words, commonness_ppm); empty docs are dropped
    (a mean over zero words is undefined, matching the oracle's
    inner-join + GROUP BY semantics).

    Bound: ``wc * ppm_scale`` must fit int64, i.e. the most frequent
    word may occur at most ~9.2e12 times at the default scale — ~5% of
    a 1.8e14-token corpus. Beyond that, pass a smaller ``ppm_scale``
    (the score is a ratio; the scale only sets its resolution).
    """
    ex = df.select(id_col, F.explode(words(F.col(text_col))).alias("word"))
    wf = ex.groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    total = wf.agg(F.sum("wc").alias("tot"))
    ppm = (wf.crossJoin(F.broadcast(total))
           .select("word", F.expr(f"wc * {ppm_scale} DIV tot")
                   .alias("ppm")))
    return (ex.join(F.broadcast(ppm), "word")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.expr("sum(ppm) DIV count(1)").alias("commonness_ppm")))


# ---------------------------------------------------------------------------
# PII scrubbing

# Pattern set restricted to the Java-regex ∩ RE2 common subset (no
# backrefs, no lookaround, ASCII classes only) so a DuckDB oracle
# reproduces counts AND replacements bit-for-bit.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
              "<EMAIL>"),
    "ipv4": (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
}


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None,
              patterns: dict[str, tuple[str, str]] | None = None
              ) -> DataFrame:
    """Redact PII-shaped spans and count them — the standard corpus
    hygiene pass before training. Adds one ``n_<kind>`` count column
    per pattern (matched against the ORIGINAL text, so counts are
    independent of replacement order) and rewrites ``out_col``
    (default: ``text_col`` in place) with every pattern replaced by
    its placeholder, applied sequentially in dict order.

    Plan shape: map-only JVM regex (``regexp_count`` /
    ``regexp_replace``), zero shuffles, whole-stage codegen — a pure
    scan transform at any corpus size. Patterns must stay inside the
    Java∩RE2 subset (see ``PII_PATTERNS``) or cross-engine oracles
    diverge; count-column collisions raise rather than silently
    overwriting user columns.

    Reference analogue: none (the reference is a decode-side plugin);
    this extends the training-pipeline operator family
    (SURVEY.md §2 additions).
    """
    pats = patterns or PII_PATTERNS
    clash = [f"n_{k}" for k in pats if f"n_{k}" in df.columns]
    if clash:
        raise ValueError(
            f"scrub_pii count column(s) {clash} already exist on the "
            "input — rename them or pass a custom patterns dict")
    out = df
    for kind, (rx, _) in pats.items():
        out = out.withColumn(f"n_{kind}",
                             F.regexp_count(F.col(text_col), F.lit(rx)))
    scrubbed = F.col(text_col)
    for _, (rx, tok) in pats.items():
        scrubbed = F.regexp_replace(scrubbed, rx, tok)
    return out.withColumn(out_col or text_col, scrubbed)
