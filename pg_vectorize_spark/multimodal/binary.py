"""Multimodal columns — image/audio/video as opaque binary + typed metadata.

Training-data pipelines carry media as ``binary`` columns with a typed
metadata struct; the Spark-side plumbing (schema, partition-friendly ops,
Arrow batch shapes) is real and tested here, while actual codec work is
stubbed: the container has no image/audio libraries, so ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, which produces a
deterministic fake decode (byte-derived features) with the same schema the
real decoder would emit.

Ops:
- ``with_media_columns`` — attach (media_type, byte_len, content_hash)
  metadata to a binary column, all JVM-side;
- ``binary_metadata`` — standalone metadata projection;
- ``decode_media`` — mapInPandas decode stub -> (pkey, width, height,
  n_channels, feature array). Batch shape: one Arrow batch in, one out;
- ``frame_sample`` — sample "frames" every ``stride`` bytes (the video
  frame-sampling plumbing: posexplode over computed offsets; a real decoder
  would substitute codec frame boundaries).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_hash", StringType()),
    ]
)

def decode_schema(pkey_type=None) -> StructType:
    """Decode output schema; the key type follows the source table."""
    return StructType(
        [
            StructField("pkey", pkey_type or LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("n_channels", IntegerType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )


DECODE_SCHEMA = decode_schema()


def binary_metadata(df: DataFrame, bin_col: str) -> DataFrame:
    """Typed metadata for a binary column: byte length + content hash prefix
    (md5 hex) — pure JVM expressions, pushdown/prune friendly."""
    return df.withColumn(
        "byte_len", F.length(F.col(bin_col)).cast("long")
    ).withColumn("content_hash", F.md5(F.col(bin_col)))


def with_media_columns(
    df: DataFrame, bin_col: str, media_type: str
) -> DataFrame:
    return binary_metadata(df, bin_col).withColumn(
        "media_type", F.lit(media_type)
    )


def decode_media(
    df: DataFrame,
    bin_col: str,
    pkey: str,
    fake: bool = False,
    n_features: int = 8,
) -> DataFrame:
    """Media decode behind Arrow plumbing (one batch in, one out).

    ``fake=False`` runs the REAL stdlib decoder for PNG (zlib inflate +
    full five-filter unfilter), baseline JPEG (Huffman + IDCT + chroma
    upsample) and WAV (PCM) — see multimodal/codec.py;
    unsupported formats raise NotImplementedError inside the workers
    (surfaced as a task failure), keeping the stub honest. ``fake=True``
    emits deterministic byte-derived pseudo-features with the production
    schema so downstream stages (similarity, dedup, filtering) are
    testable end-to-end without codec fixtures.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pg_vectorize_spark.multimodal.codec import decode_features

        for pdf in batches:
            if not fake:
                out = {
                    "pkey": list(pdf["pkey"]),
                    "width": [],
                    "height": [],
                    "n_channels": [],
                    "features": [],
                }
                for blob in pdf[bin_col]:
                    w, h, ch, feats = decode_features(
                        bytes(blob or b""), n_features
                    )
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(ch)
                    out["features"].append(feats)
                yield pd.DataFrame(out)
                continue
            out = {
                "pkey": [],
                "width": [],
                "height": [],
                "n_channels": [],
                "features": [],
            }
            for pk, blob in zip(pdf["pkey"], pdf[bin_col]):
                data = bytes(blob or b"")
                n = len(data)
                # deterministic fake: dimensions from length, features from
                # byte histogram buckets
                out["pkey"].append(pk)
                out["width"].append(max(1, n % 640))
                out["height"].append(max(1, (n * 7) % 480))
                out["n_channels"].append(3)
                feats = [0.0] * n_features
                for i, byte in enumerate(data):
                    feats[byte % n_features] += 1.0
                total = sum(feats) or 1.0
                out["features"].append([v / total for v in feats])
            yield pd.DataFrame(out)

    schema = decode_schema(df.schema[pkey].dataType)
    return df.select(
        F.col(pkey).alias("pkey"), F.col(bin_col)
    ).mapInPandas(decode, schema=schema)


def frame_sample(
    df: DataFrame, bin_col: str, pkey: str, stride: int = 1024
) -> DataFrame:
    """Frame-sampling plumbing: one row per ``stride``-byte offset.

    (pkey, frame_idx, offset, frame_bytes) — JVM-side: offsets computed with
    sequence(), frames sliced with substring on binary. A real video path
    swaps byte offsets for codec keyframe indexes; the explode/partition
    shape is identical.
    """
    n_frames = F.greatest(
        F.ceil(F.length(F.col(bin_col)) / F.lit(stride)).cast("int"), F.lit(1)
    )
    return df.select(
        F.col(pkey),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i * stride,
            )
        ).alias("frame_idx", "offset"),
        F.col(bin_col),
    ).select(
        F.col(pkey),
        F.col("frame_idx"),
        F.col("offset").cast("long").alias("offset"),
        F.expr(f"substring({bin_col}, offset + 1, {stride})").alias(
            "frame_bytes"
        ),
    )


def mp4_metadata(
    df: DataFrame, bin_col: str, pkey: str
) -> DataFrame:
    """Container-level MP4 metadata per blob (codec.parse_mp4_metadata
    behind Arrow batches): (pkey, brand, duration_seconds, n_tracks,
    video_width, video_height, has_audio). The corpus-routing pass for
    video columns — length caps, resolution buckets, audio demux —
    with zero frame decoding. Non-MP4 blobs yield NULL metadata rather
    than failing the batch (a mixed media column is the normal case)."""
    import pandas as pd

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from struct import error as struct_error

        from pg_vectorize_spark.multimodal.codec import parse_mp4_metadata

        for pdf in batches:
            out = {
                "pkey": list(pdf["pkey"]),
                "brand": [],
                "duration_seconds": [],
                "n_tracks": [],
                "video_width": [],
                "video_height": [],
                "has_audio": [],
            }
            for blob in pdf[bin_col]:
                try:
                    meta = parse_mp4_metadata(bytes(blob or b""))
                except (ValueError, struct_error, IndexError, MemoryError):
                    for k in (
                        "brand", "duration_seconds", "n_tracks",
                        "video_width", "video_height", "has_audio",
                    ):
                        out[k].append(None)
                    continue
                vid = next(
                    (t for t in meta["tracks"] if t["handler"] == "vide"),
                    None,
                )
                out["brand"].append(meta["brand"])
                out["duration_seconds"].append(meta["duration_seconds"])
                out["n_tracks"].append(meta["n_tracks"])
                out["video_width"].append(vid["width"] if vid else None)
                out["video_height"].append(vid["height"] if vid else None)
                out["has_audio"].append(
                    any(t["handler"] == "soun" for t in meta["tracks"])
                )
            yield pd.DataFrame(out)

    # key type follows the source table (same contract as decode_media's
    # decode_schema) — a string/int pkey must not hit an Arrow long cast
    key_type = df.schema[pkey].dataType.simpleString()
    return df.select(
        F.col(pkey).alias("pkey"), F.col(bin_col)
    ).mapInPandas(
        parse,
        schema=(
            f"pkey {key_type}, brand string, duration_seconds double, "
            "n_tracks int, video_width int, video_height int, "
            "has_audio boolean"
        ),
    )


def mp4_frame_sample(
    df: DataFrame,
    bin_col: str,
    pkey: str,
    keyframes_only: bool = False,
    every_n: int = 1,
) -> DataFrame:
    """REAL video frame sampling at the container level: one output row
    per coded video sample of each MP4 blob, with the exact payload
    bytes sliced out of mdat via the ISO-BMFF sample tables
    (codec.parse_mp4_samples — stsz/stco/stsc/stts/stss, no codec
    work). The upgrade over the byte-stride ``frame_sample``: offsets,
    sizes, timestamps, and keyframe flags are the CONTAINER's, so
    "extract keyframes" / "1 frame per second" corpus passes operate on
    true frame boundaries. Decoding the extracted H.264/H.265 payload
    remains the honest NotImplementedError.

    ``keyframes_only`` keeps sync samples (stss) only; ``every_n``
    then keeps every n-th surviving frame. Non-MP4 / malformed blobs
    contribute zero rows (a mixed media column is the normal case —
    route with ``mp4_metadata``/``binary_metadata`` first).

    Output: (pkey, frame_idx, offset, size, ts_seconds, keyframe,
    frame_bytes). Scale shape: pure mapInPandas over (pkey, blob) —
    no shuffle; downstream per-frame work partitions on (pkey,
    frame_idx).
    """
    import pandas as pd

    key_type = df.schema[pkey].dataType.simpleString()

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from struct import error as struct_error

        from pg_vectorize_spark.multimodal.codec import parse_mp4_samples

        for pdf in batches:
            out = {
                "pkey": [],
                "frame_idx": [],
                "offset": [],
                "size": [],
                "ts_seconds": [],
                "keyframe": [],
                "frame_bytes": [],
            }
            for key, blob in zip(pdf["pkey"], pdf[bin_col]):
                raw = bytes(blob or b"")
                try:
                    samples = parse_mp4_samples(raw)
                except (ValueError, struct_error, IndexError, MemoryError):
                    continue
                if keyframes_only:
                    samples = [s for s in samples if s["keyframe"]]
                samples = samples[:: max(1, every_n)]
                for s in samples:
                    out["pkey"].append(key)
                    out["frame_idx"].append(s["index"])
                    out["offset"].append(s["offset"])
                    out["size"].append(s["size"])
                    out["ts_seconds"].append(s["ts_seconds"])
                    out["keyframe"].append(s["keyframe"])
                    out["frame_bytes"].append(
                        raw[s["offset"] : s["offset"] + s["size"]]
                    )
            yield pd.DataFrame(out)

    return df.select(
        F.col(pkey).alias("pkey"), F.col(bin_col)
    ).mapInPandas(
        extract,
        schema=(
            f"pkey {key_type}, frame_idx int, offset long, size long, "
            "ts_seconds double, keyframe boolean, frame_bytes binary"
        ),
    )


def mp3_metadata(df: DataFrame, bin_col: str, pkey: str) -> DataFrame:
    """Stream-level MPEG-audio metadata per blob (codec.parse_mp3_frames
    behind Arrow batches): (pkey, version, sample_rate, channel_mode,
    n_frames, duration_seconds, bitrate_kbps_mean, is_vbr, has_id3,
    has_crc, first_frame_offset, stream_bytes). The corpus-routing pass
    for audio columns — duration caps, CBR/VBR split, bitrate-quality
    buckets, ID3 demux — from the 4-byte frame-header walk alone;
    payload decode stays NotImplementedError (codec.py module note).
    Non-MP3 blobs yield NULL metadata rather than failing the batch."""
    import pandas as pd

    meta_cols = (
        "version", "sample_rate", "channel_mode", "n_frames",
        "duration_seconds", "bitrate_kbps_mean", "is_vbr", "has_id3",
        "has_crc", "first_frame_offset", "stream_bytes",
    )

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pg_vectorize_spark.multimodal.codec import parse_mp3_frames

        for pdf in batches:
            out: dict = {"pkey": list(pdf["pkey"])}
            for c in meta_cols:
                out[c] = []
            for blob in pdf[bin_col]:
                try:
                    m = parse_mp3_frames(bytes(blob or b""))
                except (ValueError, IndexError):
                    for c in meta_cols:
                        out[c].append(None)
                    continue
                first = m["frames"][0]
                last = m["frames"][-1]
                out["version"].append(m["version"])
                out["sample_rate"].append(m["sample_rate"])
                out["channel_mode"].append(m["channel_mode"])
                out["n_frames"].append(m["n_frames"])
                out["duration_seconds"].append(m["duration_seconds"])
                out["bitrate_kbps_mean"].append(m["bitrate_kbps_mean"])
                out["is_vbr"].append(m["is_vbr"])
                out["has_id3"].append(m["has_id3"])
                out["has_crc"].append(m["has_crc"])
                out["first_frame_offset"].append(first["offset"])
                out["stream_bytes"].append(
                    last["offset"] + last["size"]
                )
            yield pd.DataFrame(out)

    key_type = df.schema[pkey].dataType.simpleString()
    return df.select(
        F.col(pkey).alias("pkey"), F.col(bin_col)
    ).mapInPandas(
        parse,
        schema=(
            f"pkey {key_type}, version string, sample_rate int, "
            "channel_mode string, n_frames int, duration_seconds double, "
            "bitrate_kbps_mean double, is_vbr boolean, has_id3 boolean, "
            "has_crc boolean, first_frame_offset long, stream_bytes long"
        ),
    )
