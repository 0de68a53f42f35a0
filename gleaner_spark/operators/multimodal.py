"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata.

The reference pipeline is text/JSON-LD-only; a training-data engine at
100 TB also carries media payloads.  Design: the payload is an opaque
``binary`` column; metadata (mime, width/height, sample rate, duration)
is a typed struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages so each executor touches the
bytes exactly once per stage.

The actual codec step is STUBBED (Pillow / torchaudio / ffmpeg are not
in this container): ``decode_image_stub`` raises ``NotImplementedError``
when ``GLEANER_REAL_DECODE=1`` would require a real library, and
otherwise produces a deterministic fake decode derived from the payload
bytes — so the Spark-side plumbing (schema, partitioning, UDF signature,
batch shape) is real and fully tested while the codec is swappable.

Scale notes: media rows are large and skewed → the stages repartition by
``pmod(xxhash64(payload_id), N)`` before the decode pass (uniform bytes
per task, no mega-file hot partition), and metadata-only queries never
deserialize the binary column (column pruning keeps it out of the scan).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "payload_id string, mime string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, duration_ms:int>"
)

DECODED_SCHEMA = (
    "payload_id string, mime string, width int, height int, "
    "n_pixels bigint, mean_luma double, feature array<float>"
)

FRAME_SCHEMA = (
    "payload_id string, frame_idx int, frame_ts_ms int, frame_md5 string"
)

FEATURE_DIM = 16


def _fake_pixels(payload: bytes, n: int) -> list[int]:
    """Deterministic fake 'decode': n pseudo-luma bytes derived from the
    payload via iterated sha256 — stands in for a real codec so batch
    shapes, memory profile and determinism tests are meaningful."""
    out: list[int] = []
    block = hashlib.sha256(payload).digest()
    while len(out) < n:
        out.extend(block)
        block = hashlib.sha256(block).digest()
    return out[:n]


def decode_image_stub(payload: bytes, meta_width: int, meta_height: int):
    """STUB for the image codec.  A real deployment replaces this body
    with Pillow/libvips; the container has neither, so the decode is a
    deterministic function of the bytes.  Raises for the real path to
    make the stub boundary explicit."""
    import os

    if os.environ.get("GLEANER_REAL_DECODE") == "1":
        raise NotImplementedError(
            "real image decode requires Pillow/libvips, absent in this "
            "container; unset GLEANER_REAL_DECODE for the deterministic stub"
        )
    w = max(int(meta_width or 0), 1)
    h = max(int(meta_height or 0), 1)
    return w, h, _fake_pixels(payload, min(w * h, 4096))


def decode_features(media: DataFrame, repartition_to: int | None = None) -> DataFrame:
    """Decode + feature-extract over ``mapInPandas``: one pass over the
    binary column per partition, emitting a fixed-dim float feature and
    scalar stats.  Arrow batches stream partition-internally, so peak
    memory is one batch of payloads, not one partition."""
    if repartition_to:
        media = media.repartition(
            repartition_to, F.pmod(F.xxhash64("payload_id"), F.lit(repartition_to))
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            # zip over the column arrays — iterrows() materializes a
            # Series per row and upcasts mixed dtypes (round-1 review
            # finding; matters once real decoders replace the stub)
            for pid, mime, payload, meta in zip(
                pdf["payload_id"], pdf["mime"], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload) if payload is not None else b""
                w, h, pixels = decode_image_stub(
                    payload,
                    (meta["width"] if meta is not None else 0) or 0,
                    (meta["height"] if meta is not None else 0) or 0,
                )
                n_px = w * h
                mean_luma = (sum(pixels) / len(pixels)) if pixels else 0.0
                feat = [
                    float(sum(pixels[i::FEATURE_DIM][:256]) % 10007) / 10007.0
                    for i in range(FEATURE_DIM)
                ]
                rows.append((pid, mime, w, h, n_px, round(mean_luma, 6), feat))
            yield pd.DataFrame(
                rows,
                columns=["payload_id", "mime", "width", "height",
                         "n_pixels", "mean_luma", "feature"],
            )

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame (``flatMap`` shape via mapInPandas), frame content
    stubbed as md5(payload || frame_idx).  A real deployment swaps the
    frame extraction for ffmpeg; row multiplication, timestamps and
    partitioning are the part that matters at scale."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, payload, meta in zip(
                pdf["payload_id"], pdf["payload"], pdf["meta"]
            ):
                payload = bytes(payload) if payload is not None else b""
                dur = (meta["duration_ms"] if meta is not None else 0) or 0
                n = min(max(dur // every_ms, 1), max_frames)
                for k in range(int(n)):
                    ts = k * every_ms
                    fm = hashlib.md5(payload + str(k).encode()).hexdigest()
                    rows.append((pid, k, ts, fm))
            yield pd.DataFrame(
                rows, columns=["payload_id", "frame_idx", "frame_ts_ms",
                               "frame_md5"],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only projection — never touches ``payload`` (column
    pruning keeps the binary out of the scan; verify with
    ``.explain``'s ReadSchema)."""
    return media.select(
        "payload_id",
        "mime",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


def gen_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                mime = ["image/png", "audio/wav", "video/mp4"][i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (
                    1 + i % 4
                )
                meta = {
                    "width": 16 + (i % 8) * 16 if mime.startswith("image") else None,
                    "height": 16 + (i % 5) * 16 if mime.startswith("image") else None,
                    "sample_rate": 16000 if mime.startswith("audio") else None,
                    "duration_ms": (i % 10) * 1000 if not mime.startswith("image") else None,
                }
                rows.append((f"m{i:06d}", mime, payload, meta))
            yield pd.DataFrame(
                rows, columns=["payload_id", "mime", "payload", "meta"]
            )

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)
