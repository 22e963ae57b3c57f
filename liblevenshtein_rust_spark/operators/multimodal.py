"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata; the
decode / feature-extraction steps run as Arrow-batched ``mapInPandas``
stages. The actual codecs are NOT available in this environment, so the
decode kernels are stubs behind ``decoder=``:

- ``decoder="fake"`` (default): deterministic hash-derived features —
  real batch shapes, real schema, fake pixels. Lets every Spark-side
  contract (partitioning, batch sizes, schema evolution) be tested.
- ``decoder="pillow"`` / ``"ffmpeg"``: raise NotImplementedError with a
  clear message; the integration point is the single ``_decode_batch``
  function below.

Scale notes: media rows are orders of magnitude wider than text rows, so
``featurize_media`` repartitions by a byte-size budget before the Python
stage (each Arrow batch stays within executor memory) — the media analog
of tuning spark.sql.files.maxPartitionBytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),
    StructField("meta", MapType(StringType(), StringType())),
])

FEATURE_DIM = 32

FEATURES_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("features", ArrayType(FloatType())),
])


def _decode_batch(payloads: pd.Series, kinds: pd.Series,
                  decoder: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """payloads -> (width[B], height[B], features[B, FEATURE_DIM]).

    STUB: only the deterministic "fake" decoder is implemented here (no
    image/audio libraries in this container). A real deployment plugs
    Pillow/ffmpeg in at exactly this seam; everything around it (Arrow
    batching, schema, partition sizing) is production-shaped.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: real codecs are not available in this "
            "environment; use decoder='fake' (deterministic hash features) "
            "or plug a codec into _decode_batch")
    B = len(payloads)
    blobs = [bytes(p) if p is not None else b"" for p in payloads]
    lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=B)
    widths = (16 + lens % 64).astype(np.int32)
    heights = (16 + (lens // 64) % 64).astype(np.int32)
    # deterministic pseudo-features: per-row chunked byte sums, computed as
    # ONE reduceat over the padded concatenation of the whole batch — the
    # vectorized-across-the-batch shape a real decoder should copy (no
    # per-row Python work beyond the unavoidable bytes() materialization)
    feats = np.zeros((B, FEATURE_DIM), dtype=np.float32)
    padded_lens = np.maximum((lens + FEATURE_DIM - 1) // FEATURE_DIM, 1) * FEATURE_DIM
    total = int(padded_lens.sum())
    buf = np.zeros(total, dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(padded_lens)[:-1]])
    for i, b in enumerate(blobs):  # memcpy per row; O(bytes), not O(rows*dim)
        if b:
            buf[starts[i]:starts[i] + lens[i]] = np.frombuffer(b, dtype=np.uint8)
    # chunk j of row i = contiguous block of padded_lens[i]/FEATURE_DIM bytes
    chunk = (padded_lens // FEATURE_DIM).astype(np.int64)
    offsets = (starts[:, None] + np.arange(FEATURE_DIM)[None, :] * chunk[:, None]).ravel()
    sums = np.add.reduceat(buf.astype(np.int64), offsets)
    feats[:] = sums.reshape(B, FEATURE_DIM).astype(np.float32)
    feats[lens == 0] = 0.0
    return widths, heights, feats


def featurize_media(media: DataFrame, *, decoder: str = "fake",
                    n_partitions: int | None = None) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    Output schema: FEATURES_SCHEMA. Partition byte-budgets come from the
    SOURCE scan, not from an eager stat job: for file-backed media Spark
    already bounds bytes/partition via spark.sql.files.maxPartitionBytes,
    and Arrow batch size is bounded by arrow.maxRecordsPerBatch — so no
    driver-side full scan of payload sizes is needed (the previous
    ``sum(octet_length)`` probe was a full pass over the table before the
    job even started — wrong shape at 100 TB). Pass ``n_partitions`` to
    override explicitly (e.g. after a filter that skewed partition sizes).
    """
    sized = media.repartition(n_partitions, "media_id") if n_partitions else media

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w, h, f = _decode_batch(pdf["payload"], pdf["kind"], decoder)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda x: len(x) if x is not None else 0),
                "width": w,
                "height": h,
                "features": list(f),
            })

    return sized.mapInPandas(_featurize, schema=FEATURES_SCHEMA)


def synth_media(spark, docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from documents: payload = utf-8
    bytes of the text (an opaque blob as far as the pipeline cares),
    kind cycles image/audio/video, metadata carries provenance."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.concat(F.lit("m_"), F.col(id_col).cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.lit("documents"),
                     F.lit("doc_id"), F.col(id_col).cast("string")).alias("meta"),
    )
