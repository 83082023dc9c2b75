"""Custom stateful streaming operators (applyInPandasWithState).

The reference is batch-only; these are the streaming-state shapes a
continuous training-data pipeline needs, built on Spark's arbitrary
stateful processing (Arrow-batched per group — state I/O is per *group*,
row work stays vectorized in pandas/numpy):

- :func:`dedup_stream` — exact streaming deduplication: the first document
  per fingerprint passes, later arrivals (same or later micro-batch) are
  dropped. State per fingerprint is a single seen-flag; with content-hash
  keys the state store grows with unique documents, so production runs
  bound it with a TTL timeout (exposed as ``ttl_ms``).
- :func:`running_totals_stream` — cumulative per-source token counters
  across micro-batches (the streaming analogue of the manifest metrics
  roll-up).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_DDL = ("doc_id string, tokens array<int>, n_tok int, "
                 "source string, fp string")
DEDUP_STATE_DDL = "seen int"

TOTALS_OUT_DDL = "source string, total_tokens long, total_docs long"
TOTALS_STATE_DDL = "total_tokens long, total_docs long"


def _make_dedup_group(ttl_ms: int | None):
    def dedup_group(key: tuple, pdfs: Iterator[pd.DataFrame],
                    state: GroupState) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()  # forget this fingerprint; frees the state slot
            return
        already = state.exists
        first_emitted = False
        for pdf in pdfs:
            if already or first_emitted or len(pdf) == 0:
                continue
            yield pdf.iloc[[0]]
            first_emitted = True
        if first_emitted or already:
            state.update((1,))
            if ttl_ms is not None:
                # refresh the TTL on every sighting; an expired entry may
                # re-admit a duplicate — the standard bounded-state trade
                state.setTimeoutDuration(ttl_ms)

    return dedup_group


def dedup_stream(stream: DataFrame, ttl_ms: int | None = None) -> DataFrame:
    """Streaming exact dedup on a text fingerprint.

    Input: the tokens-table stream plus a ``fp`` fingerprint column (add
    one with ``with_fingerprint``). Output: first occurrence of each
    fingerprint only, across all micro-batches of the query. ``ttl_ms``
    bounds the state store: fingerprints unseen for that long are
    forgotten (and could then be re-admitted once).
    """
    timeout = (GroupStateTimeout.ProcessingTimeTimeout if ttl_ms
               else GroupStateTimeout.NoTimeout)
    return (stream.groupBy("fp")
            .applyInPandasWithState(_make_dedup_group(ttl_ms),
                                    DEDUP_OUT_DDL, DEDUP_STATE_DDL,
                                    "append", timeout))


def with_fingerprint(df: DataFrame, text_from_tokens: bool = True) -> DataFrame:
    """fp = md5 of the token array rendered as a string (exact-content
    fingerprint; JVM-side built-ins only)."""
    return df.withColumn(
        "fp", F.md5(F.concat_ws(",", F.col("tokens").cast("array<string>"))))


def _totals_group(key: tuple, pdfs: Iterator[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
    toks, docs = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        toks += int(pdf["n_tok"].sum())
        docs += len(pdf)
    state.update((toks, docs))
    yield pd.DataFrame({"source": [key[0]], "total_tokens": [toks],
                        "total_docs": [docs]})


def running_totals_stream(stream: DataFrame) -> DataFrame:
    """Cumulative (tokens, docs) per source across micro-batches."""
    return (stream.select("source", "n_tok")
            .groupBy("source")
            .applyInPandasWithState(_totals_group, TOTALS_OUT_DDL,
                                    TOTALS_STATE_DDL, "update",
                                    GroupStateTimeout.NoTimeout))
