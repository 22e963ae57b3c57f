"""applyInPandasWithState streaming operators (streaming/stateful.py)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from liblevenshtein_rust_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from liblevenshtein_rust_spark.streaming.stateful import (
    streaming_exact_dedup,
    windowed_turn_counts,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, TRANSCRIPT_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def _rows(conv, idx, text, ts="2026-01-01 00:00:00"):
    import datetime
    t = datetime.datetime.fromisoformat(ts)
    return (conv, idx, "user", text, "none", t)


def _run_dedup(spark, inp, ckpt, out):
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(inp)
    q = (streaming_exact_dedup(stream).writeStream
         .format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()


def test_streaming_dedup_emits_first_seen_only(spark, tmp_path):
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(inp, exist_ok=True)

    _write_batch(spark, inp, [
        _rows("c1", 0, "Hello  World"),
        _rows("c2", 0, "hello world"),     # dup of the above (canon)
        _rows("c1", 1, "something else"),
    ])
    _run_dedup(spark, inp, ckpt, out)
    got = {r.text: (r.first_conv_id, r.first_turn_idx)
           for r in spark.read.parquet(out).collect()}
    assert got == {"hello world": ("c1", 0), "something else": ("c1", 1)}

    # batch 2: one repeat (must NOT re-emit), one new
    _write_batch(spark, inp, [
        _rows("c3", 0, "HELLO WORLD"),
        _rows("c3", 1, "brand new"),
    ])
    _run_dedup(spark, inp, ckpt, out)
    rows = spark.read.parquet(out).collect()
    texts = sorted(r.text for r in rows)
    assert texts == ["brand new", "hello world", "something else"]
    # state survived the restart: the repeat did not produce a second row
    assert len([r for r in rows if r.text == "hello world"]) == 1


def test_windowed_counts_with_watermark(spark, tmp_path):
    inp = str(tmp_path / "in")
    os.makedirs(inp, exist_ok=True)
    _write_batch(spark, inp, [
        _rows("c1", 0, "a", "2026-01-01 00:01:00"),
        _rows("c1", 1, "b", "2026-01-01 00:02:00"),
        _rows("c1", 2, "c", "2026-01-01 00:06:00"),
        _rows("c2", 0, "d", "2026-01-01 00:03:00"),
    ])
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(inp)
    q = (windowed_turn_counts(stream, watermark="10 minutes", window="5 minutes")
         .writeStream.format("memory").queryName("wincounts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(str(r.win_start)[11:16], r.conv_id): r.n_turns
           for r in spark.sql("select * from wincounts").collect()}
    assert got == {("00:00", "c1"): 2, ("00:05", "c1"): 1, ("00:00", "c2"): 1}


def test_streaming_dedup_min_across_arrow_chunks(spark, tmp_path):
    # force the fingerprint group to span multiple Arrow chunks: the
    # first-seen row must be the global (conv_id, turn_idx) minimum, not
    # the first chunk's minimum
    inp = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    os.makedirs(inp, exist_ok=True)
    # descending conv ids so the true minimum arrives late in file order
    rows = [_rows(f"c{99 - i:02d}", 0, "same utterance") for i in range(40)]
    _write_batch(spark, inp, rows)
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        _run_dedup(spark, inp, ckpt, out)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    assert (got[0].first_conv_id, got[0].first_turn_idx) == ("c60", 0)
