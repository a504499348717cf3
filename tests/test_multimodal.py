"""Multimodal binary-column plumbing: schema, metadata, decode stub batch
shape, frame sampling."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.multimodal.binary import (
    binary_metadata,
    decode_media,
    frame_sample,
    with_media_columns,
)


def _bin_df(spark):
    rows = [
        (1, bytearray(b"\x89PNG fake image bytes" * 100)),
        (2, bytearray(b"RIFF fake audio" * 10)),
        (3, bytearray(b"")),
    ]
    return spark.createDataFrame(rows, "id long, content binary")


def test_binary_metadata(spark):
    out = {r["id"]: r for r in binary_metadata(_bin_df(spark), "content").collect()}
    assert out[1]["byte_len"] == 21 * 100
    assert out[3]["byte_len"] == 0
    assert len(out[1]["content_hash"]) == 32  # md5 hex
    assert out[1]["content_hash"] != out[2]["content_hash"]


def test_with_media_columns(spark):
    out = with_media_columns(_bin_df(spark), "content", "image/png").head()
    assert out["media_type"] == "image/png"


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(Exception) as exc_info:
        decode_media(_bin_df(spark), "content", "id", fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_fake_deterministic_schema(spark):
    out = decode_media(_bin_df(spark), "content", "id", fake=True)
    assert [f.name for f in out.schema.fields] == [
        "pkey", "width", "height", "n_channels", "features",
    ]
    rows = {r["pkey"]: r for r in out.collect()}
    assert len(rows) == 3
    assert len(rows[1]["features"]) == 8
    assert abs(sum(rows[1]["features"]) - 1.0) < 1e-9
    # determinism
    rows2 = {
        r["pkey"]: r
        for r in decode_media(_bin_df(spark), "content", "id", fake=True).collect()
    }
    assert rows[1]["features"] == rows2[1]["features"]


def test_frame_sample(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256)) * 10))], "id long, content binary"
    )  # 2560 bytes
    out = frame_sample(df, "content", "id", stride=1024).collect()
    assert len(out) == 3  # ceil(2560/1024)
    assert [r["offset"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        0, 1024, 2048,
    ]
    sizes = [len(r["frame_bytes"]) for r in sorted(out, key=lambda r: r["frame_idx"])]
    assert sizes == [1024, 1024, 512]


def test_frame_sample_empty_binary(spark):
    df = spark.createDataFrame([(1, bytearray(b""))], "id long, content binary")
    out = frame_sample(df, "content", "id", stride=100).collect()
    assert len(out) == 1 and out[0]["offset"] == 0
