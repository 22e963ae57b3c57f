"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata; the
decode / feature-extraction steps run as Arrow-batched ``mapInPandas``
stages. Decoders, selected with ``decoder=``:

- ``decoder="auto"``: REAL header+payload parsing for the two formats
  that need no external library — uncompressed **BMP** images (header
  fields + pixel bytes -> luminance histogram features) and PCM **WAV**
  audio (fmt/data chunks -> per-slice RMS energy envelope). Formats that
  require a codec library (JPEG/PNG/MP4/...) raise NotImplementedError
  at exactly this seam — Pillow/ffmpeg plug into ``_decode_one``.
- ``decoder="fake"`` (default): deterministic byte-sum features — no
  parsing at all; exercises every Spark-side contract (partitioning,
  batch shapes, schema) with arbitrary payload bytes.

Feature semantics under ``auto``: images -> (width, height) from the
BMP header, features = 32-bin pixel-byte histogram (normalized); audio
-> width = sample rate, height = channels, features = RMS of 32 equal
time slices of the PCM signal.

Scale notes: media rows are orders of magnitude wider than text rows;
partition byte budgets come from the source scan
(spark.sql.files.maxPartitionBytes) and Arrow batch rows from
arrow.maxRecordsPerBatch — see ``featurize_media``.
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


def _decode_bmp(b: bytes) -> tuple[int, int, np.ndarray]:
    """Uncompressed BMP: (width, height, 32-bin pixel histogram)."""
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = abs(int.from_bytes(b[22:26], "little", signed=True))
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0:
        raise NotImplementedError(
            f"compressed BMP (compression={comp}) needs a codec library")
    px = np.frombuffer(b, dtype=np.uint8, offset=off)
    hist = np.histogram(px, bins=FEATURE_DIM, range=(0, 256))[0]
    feats = (hist / max(px.size, 1)).astype(np.float32)
    del bpp
    return w, h, feats


def _decode_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """Canonical PCM WAV: (sample_rate, channels, 32-slice RMS envelope)."""
    if len(b) < 44 or b[8:12] != b"WAVE":
        raise ValueError("not a WAVE file")
    # walk RIFF chunks for fmt / data
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(b):
        cid = b[pos:pos + 4]
        sz = int.from_bytes(b[pos + 4:pos + 8], "little")
        if cid == b"fmt ":
            fmt = b[pos + 8:pos + 8 + sz]
        elif cid == b"data":
            data = b[pos + 8:pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_fmt != 1 or bits != 16:
        raise NotImplementedError(
            f"non-PCM16 WAV (fmt={audio_fmt}, bits={bits}) needs a codec")
    x = np.frombuffer(data[:len(data) - (len(data) % 2)], dtype="<i2") \
        .astype(np.float64)
    if x.size == 0:
        return rate, channels, np.zeros(FEATURE_DIM, np.float32)
    n = (x.size // FEATURE_DIM) * FEATURE_DIM
    if n == 0:
        pad = np.zeros(FEATURE_DIM, np.float64)
        pad[:x.size] = x
        x, n = pad, FEATURE_DIM
    env = np.sqrt((x[:n].reshape(FEATURE_DIM, -1) ** 2).mean(axis=1))
    return rate, channels, env.astype(np.float32)


def _decode_one(b: bytes) -> tuple[int, int, np.ndarray]:
    """Sniff-and-decode a single payload. This is THE codec seam: a real
    deployment adds `elif` arms calling Pillow/ffmpeg here; per-payload
    dispatch is inherent (formats vary row to row), the numeric work per
    payload is numpy."""
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return _decode_wav(b)
    raise NotImplementedError(
        "payload format not decodable without a codec library "
        f"(magic={b[:4]!r}); plug Pillow/ffmpeg into _decode_one")


def _decode_batch(payloads: pd.Series, kinds: pd.Series,
                  decoder: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """payloads -> (width[B], height[B], features[B, FEATURE_DIM])."""
    if decoder == "auto":
        B = len(payloads)
        widths = np.zeros(B, dtype=np.int32)
        heights = np.zeros(B, dtype=np.int32)
        feats = np.zeros((B, FEATURE_DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            w, h, f = _decode_one(bytes(p) if p is not None else b"")
            widths[i], heights[i], feats[i] = w, h, f
        return widths, heights, feats
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r}: use 'auto' (BMP/PCM-WAV, library-free), "
            "'fake' (byte-sum features), or plug a codec into _decode_one")
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


def bmp_payload(seed: bytes) -> bytes:
    """Deterministic uncompressed 24-bpp BMP whose pixel bytes cycle the
    seed. Valid per the BITMAPINFOHEADER spec — parseable by any viewer."""
    w = 8 + (len(seed) % 9)
    h = 4 + (len(seed) % 5)
    row = w * 3
    stride = row + ((-row) % 4)
    px_size = stride * h
    seed = seed or b"\x00"
    reps = px_size // len(seed) + 1
    pixels = (seed * reps)[:px_size]
    header = (
        b"BM" + (54 + px_size).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + px_size.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + b"\x00" * 8
    )
    return header + pixels


def wav_payload(seed: bytes, rate: int = 8000) -> bytes:
    """Deterministic canonical PCM16 mono WAV; samples derived from the
    seed bytes (centered, scaled to 16 bits)."""
    seed = seed or b"\x00"
    samples = ((np.frombuffer(seed, dtype=np.uint8).astype(np.int16) - 128)
               * 256).astype("<i2").tobytes()
    header = (
        b"RIFF" + (36 + len(samples)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
        + rate.to_bytes(4, "little") + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(samples).to_bytes(4, "little")
    )
    return header + samples


def synth_media(spark, docs: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text", real_payloads: bool = False,
                video_frames: int | None = None) -> DataFrame:
    """Deterministic media table derived from documents; kind cycles
    image/audio/video, metadata carries provenance.

    ``real_payloads=True`` assembles actual format bytes — BMP for
    images, PCM WAV for audio (decodable by ``decoder="auto"``). Video:
    by default an opaque blob (exercising the NotImplementedError codec
    seam); with ``video_frames=k`` a concatenated-BMP 'motion-BMP'
    container of k frames (see mbmp_payload) that sample_frames can walk.
    False keeps raw utf-8 bytes."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
    )
    base = docs.select(
        F.concat(F.lit("m_"), F.col(id_col).cast("string")).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("source"), F.lit("documents"),
                     F.lit("doc_id"), F.col(id_col).cast("string")).alias("meta"),
    )
    if not real_payloads:
        return base

    def _assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for k, p in zip(pdf["kind"], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                if k == "image":
                    out.append(bmp_payload(b))
                elif k == "audio":
                    out.append(wav_payload(b))
                elif video_frames:
                    out.append(mbmp_payload(b, video_frames))
                else:
                    out.append(b)
            pdf = pdf.copy()
            pdf["payload"] = out
            yield pdf

    return base.mapInPandas(_assemble, schema=MEDIA_SCHEMA)


RESIZED_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("payload", BinaryType()),
])

FRAME_SCHEMA = StructType([
    StructField("media_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("n_frames", IntegerType()),
    StructField("payload", BinaryType()),
])


def _bmp_grid(b: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bpp BMP into an (h, w, 3) uint8 array
    (file row order, i.e. bottom-up — callers that only re-encode do not
    need the vertical flip)."""
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = abs(int.from_bytes(b[22:26], "little", signed=True))
    bpp = int.from_bytes(b[28:30], "little")
    if bpp != 24:
        raise NotImplementedError(f"{bpp}-bpp BMP resize needs a codec")
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(b, dtype=np.uint8, offset=off, count=stride * h)
    return px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)


def _bmp_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> uncompressed 24-bpp BMP bytes (same header
    layout as bmp_payload)."""
    h, w = img.shape[0], img.shape[1]
    row = w * 3
    stride = row + ((-row) % 4)
    buf = np.zeros((h, stride), dtype=np.uint8)
    buf[:, :row] = img.reshape(h, row)
    px = buf.tobytes()
    header = (
        b"BM" + (54 + len(px)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(px).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + b"\x00" * 8
    )
    return header + px


def _resize_nn(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resample via numpy fancy indexing — the
    vectorized grid math a real resampler (Pillow/cv2) would replace."""
    h, w = img.shape[0], img.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


def resize_images(media: DataFrame, out_w: int, out_h: int, *,
                  id_col: str = "media_id") -> DataFrame:
    """Resize every image payload to (out_w, out_h) — REAL nearest-
    neighbor resampling over decoded BMP pixel grids, re-encoded as BMP.

    Output: (media_id, width, height, n_bytes, payload). Non-BMP image
    formats raise through the ``_decode_one`` codec seam contract (plug
    Pillow here). Scale shape: one mapInPandas stage, per-row numpy grid
    ops (the per-payload loop is inherent — image geometry varies row to
    row — all pixel math is vectorized numpy)."""
    out_w, out_h = int(out_w), int(out_h)
    imgs = media.where(F.col("kind") == "image")

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for p in pdf["payload"]:
                b = bytes(p) if p is not None else b""
                if b[:2] != b"BM":
                    raise NotImplementedError(
                        "non-BMP image resize needs a codec library "
                        f"(magic={b[:2]!r}); plug Pillow into resize_images")
                payloads.append(_bmp_encode(_resize_nn(_bmp_grid(b), out_w, out_h)))
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "width": np.full(len(pdf), out_w, dtype=np.int32),
                "height": np.full(len(pdf), out_h, dtype=np.int32),
                "n_bytes": np.fromiter((len(x) for x in payloads),
                                       dtype=np.int64, count=len(payloads)),
                "payload": payloads,
            })

    return imgs.mapInPandas(_resize, schema=RESIZED_SCHEMA)


def mbmp_payload(seed: bytes, n_frames: int = 4) -> bytes:
    """Deterministic 'motion-BMP' video payload: ``n_frames`` concatenated
    BMP frames, frame i built from the seed rotated by i bytes. An honest
    uncompressed container — every frame is independently decodable — so
    the frame-sampling plumbing is real; compressed containers (MP4...)
    hit the codec seam in sample_frames."""
    def _rot(i: int) -> bytes:
        # keep the ORIGINAL seed (even empty) so every frame gets the same
        # geometry bmp_payload derives from len(seed) — substituting a
        # placeholder here would silently change w/h for empty seeds
        if not seed:
            return seed
        j = i % len(seed)
        return seed[j:] + seed[:j]

    return b"".join(bmp_payload(_rot(i)) for i in range(n_frames))


def sample_frames(media: DataFrame, *, every: int = 2,
                  id_col: str = "media_id") -> DataFrame:
    """Sample every ``every``-th frame from video payloads: one output row
    per kept frame, payload = that frame's standalone BMP bytes.

    Frames are located by walking the concatenated-BMP container (each
    BMP header carries its own file size at bytes 2:6). Non-BMP-prefixed
    video raises at the codec seam (plug ffmpeg here). Scale shape: a
    wide row fans out to narrower frame rows inside one mapInPandas
    stage — no shuffle; downstream repartition rebalances if frame counts
    skew."""
    every = max(int(every), 1)
    vids = media.where(F.col("kind") == "video")

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, frames = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf["payload"]):
                b = bytes(p) if p is not None else b""
                if b[:2] != b"BM":
                    raise NotImplementedError(
                        "video container not decodable without a codec "
                        f"library (magic={b[:2]!r}); plug ffmpeg into "
                        "sample_frames")
                bounds = []
                pos = 0
                while pos + 6 <= len(b) and b[pos:pos + 2] == b"BM":
                    sz = int.from_bytes(b[pos + 2:pos + 6], "little")
                    if sz <= 0 or pos + sz > len(b):
                        break
                    bounds.append((pos, sz))
                    pos += sz
                n = len(bounds)
                for i in range(0, n, every):
                    s, sz = bounds[i]
                    ids.append(mid)
                    idxs.append(i)
                    totals.append(n)
                    frames.append(b[s:s + sz])
            yield pd.DataFrame({
                "media_id": pd.Series(ids, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "n_frames": pd.Series(totals, dtype="int32"),
                "payload": pd.Series(frames, dtype="object"),
            })

    return vids.mapInPandas(_sample, schema=FRAME_SCHEMA)
