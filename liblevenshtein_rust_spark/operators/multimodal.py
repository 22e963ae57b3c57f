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
    feats = np.zeros((B, FEATURE_DIM), dtype=np.float32)
    widths = np.zeros(B, dtype=np.int32)
    heights = np.zeros(B, dtype=np.int32)
    for i, (p, k) in enumerate(zip(payloads, kinds)):
        b = bytes(p) if p is not None else b""
        # deterministic pseudo-features: chunked byte sums (stable across
        # runs/partitions — no RNG, no codec)
        arr = np.frombuffer(b, dtype=np.uint8)
        pad = (-len(arr)) % FEATURE_DIM
        if pad:
            arr = np.concatenate([arr, np.zeros(pad, np.uint8)])
        feats[i] = arr.reshape(FEATURE_DIM, -1).sum(axis=1).astype(np.float32) \
            if arr.size else np.zeros(FEATURE_DIM, np.float32)
        widths[i] = 16 + (len(b) % 64)
        heights[i] = 16 + ((len(b) // 64) % 64)
    return widths, heights, feats


def featurize_media(media: DataFrame, *, decoder: str = "fake",
                    target_partition_bytes: int = 64 * 1024 * 1024) -> DataFrame:
    """Decode + feature-extract media rows via mapInPandas.

    Output schema: FEATURES_SCHEMA. Partitions are re-sized by payload
    bytes before the Python stage so each Arrow batch is bounded.
    """
    spark = media.sparkSession
    total = media.select(F.sum(F.octet_length("payload"))).first()[0] or 0
    n_parts = max(1, int(total // target_partition_bytes) + 1)
    sized = media.repartition(n_parts, "media_id")

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
