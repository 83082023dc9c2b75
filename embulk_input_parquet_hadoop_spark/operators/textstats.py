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


def fingerprint(text: Column) -> Column:
    """Normalization fingerprint: md5 of lowercased, space-collapsed text.

    (The rolling-hash variant lives in dedup.simhash; this is the exact-
    match fingerprint used for dedup clustering.)
    """
    return F.md5(F.regexp_replace(F.lower(text), " +", " "))
