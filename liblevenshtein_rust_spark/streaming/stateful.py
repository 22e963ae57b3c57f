"""Custom stateful streaming operators (applyInPandasWithState).

The reference's DynamicDawg keeps matcher state alive across inserts
(/root/reference/src/dictionary/dynamic_dawg.rs:344,560); the
foreachBatch upsert in streaming/incremental.py covers the bulk-state
path. This module adds the PER-KEY streaming state primitive —
``applyInPandasWithState`` — for operators whose state is naturally
keyed and incremental:

- ``streaming_exact_dedup``: emit each distinct canonical document
  exactly once across the whole stream (first-seen wins); subsequent
  occurrences only bump a per-fingerprint duplicate counter held in
  Spark-managed state. The streaming analog of exact_dedup: state is
  sharded by fingerprint across executors, checkpointed by the engine,
  and never collected to the driver.
- ``windowed_turn_counts``: per-conversation turn counts over event-time
  tumbling windows with a watermark — the late-data-tolerant streaming
  aggregation shape (pure built-in operators; no Python state).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from liblevenshtein_rust_spark.functions.canonicalize import canon_text

DEDUP_OUTPUT_SCHEMA = StructType([
    StructField("fp", StringType()),
    StructField("first_conv_id", StringType()),
    StructField("first_turn_idx", LongType()),
    StructField("text", StringType()),
    StructField("n_dups_prior", LongType()),
])

_DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _dedup_fn(key: tuple, pdfs: Iterator[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    """Group = one fingerprint. Emits a single row the first time the
    fingerprint is ever seen; afterwards only updates the seen counter."""
    (seen,) = state.get if state.exists else (0,)
    first_row = None
    n = 0
    for pdf in pdfs:
        # track the (conv_id, turn_idx)-minimal row across EVERY chunk: a
        # group larger than one Arrow batch arrives as multiple pdfs, and
        # the minimum may live in a later chunk
        if len(pdf):
            cand = (pdf.sort_values(["conv_id", "turn_idx"], kind="mergesort")
                    .iloc[0])
            if (first_row is None
                    or (cand["conv_id"], cand["turn_idx"])
                    < (first_row["conv_id"], first_row["turn_idx"])):
                first_row = cand
        n += len(pdf)
    state.update((seen + n,))
    if seen == 0 and first_row is not None:
        yield pd.DataFrame({
            "fp": [key[0]],
            "first_conv_id": [first_row["conv_id"]],
            "first_turn_idx": [int(first_row["turn_idx"])],
            "text": [first_row["text"]],
            "n_dups_prior": [0],
        })


def streaming_exact_dedup(stream: DataFrame, *,
                          text_col: str = "text") -> DataFrame:
    """Streaming first-seen dedup over canonical text.

    Input: a streaming DataFrame with (conv_id, turn_idx, text).
    Output stream (Append mode — each fingerprint emits at most one row ever): one row per NEW distinct canonical text,
    emitted in the micro-batch where it first appears. State per
    fingerprint is one counter — bounded by the number of distinct
    documents, sharded by the engine."""
    keyed = stream.select(
        "conv_id", "turn_idx",
        canon_text(text_col).alias("text"),
    ).withColumn("fp", F.md5(F.encode("text", "UTF-8")))
    return keyed.groupBy("fp").applyInPandasWithState(
        _dedup_fn,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_turn_counts(stream: DataFrame, *, ts_col: str = "ts",
                         watermark: str = "10 minutes",
                         window: str = "5 minutes") -> DataFrame:
    """Per-conversation tumbling-window turn counts with a watermark:
    rows later than ``watermark`` behind the max event time are dropped,
    and windows finalize (append mode) once the watermark passes them —
    the standard late-data contract for streaming aggregations."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("conv_id"))
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(F.col("win.start").alias("win_start"),
                F.col("win.end").alias("win_end"), "conv_id", "n_turns")
    )
