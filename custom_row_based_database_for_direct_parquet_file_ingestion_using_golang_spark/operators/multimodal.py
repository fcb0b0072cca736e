"""Multimodal columns: opaque binary payloads + typed metadata.

Generalizes the reference's IMAGE column (a resolved file path,
pkg/handlers/insert.go:168-226) to the cluster-scale design: media travels
as a ``binary`` column with a typed metadata struct, and per-item decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` — the executor-side
pattern that scales to 100 TB because bytes never leave the JVM→Arrow→pandas
batch path and partitions stay independent.

The actual codec calls (PIL/ffmpeg/soundfile) are NOT in this container, so
``decode_image`` raises ``NotImplementedError`` unless ``fake=True``, which
substitutes a deterministic stand-in (features derived from the bytes
themselves). The Spark-side plumbing — schema, batch iteration, partitioning
— is real and tested; swapping in a real codec changes one function body.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("uri", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("content_type", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_DDL = (
    "media_id long, n_bytes long, width int, height int, channels int, checksum long"
)


def decode_image(payload: bytes, fake: bool = False) -> dict:
    """Decode one image payload → {width, height, channels}.

    Real decode needs an image library not present in this container; the
    ``fake=True`` path derives deterministic pseudo-dimensions from the
    bytes so the full pipeline (schema, batching, downstream aggregation)
    is exercisable end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this environment); "
            "pass fake=True for the deterministic stand-in"
        )
    # Deterministic function of payload LENGTH only, so the whole pipeline
    # (including this stand-in) stays expressible as a SQL oracle.
    n = len(payload)
    return {
        "width": 64 + n % 640,
        "height": 64 + (n // 7) % 480,
        "channels": 1 + n % 3,
    }


def wrap_binary(df: DataFrame, id_col: str, binary_col: str, kind: str) -> DataFrame:
    """Lift an (id, binary) pair into the canonical media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(None).cast("string").alias("uri"),
        F.col(binary_col).alias("payload"),
        F.struct(
            F.lit(f"application/x-{kind}").alias("content_type"),
            F.length(binary_col).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def extract_image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-image features via Arrow-batched mapInPandas.

    Batch shape: each input pandas batch carries (media_id, payload); the
    output schema is fixed (IMAGE_FEATURES_DDL) so Catalyst can prune
    downstream. Partitioning is inherited — at scale, repartition upstream
    by size so batches stay within executor memory.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "checksum": [len(p) * 2654435761 % (1 << 32) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_DDL
    )


AUDIO_FEATURES_DDL = (
    "media_id long, n_bytes long, sample_rate int, n_channels int, duration_ms long"
)


def decode_audio(payload: bytes, fake: bool = False) -> dict:
    """Decode one audio payload → {sample_rate, n_channels, duration_ms}.

    Same contract as decode_image: real decode needs soundfile/ffmpeg (not
    in this container); ``fake=True`` derives deterministic pseudo-params
    from the byte length so the pipeline stays SQL-oracle-expressible.
    Duration is integer milliseconds: integer math is bit-identical across
    engines, where a float round would diverge (Python rounds half-to-even,
    DuckDB half-away-from-zero)."""
    if not fake:
        raise NotImplementedError(
            "audio decode requires soundfile/ffmpeg (not in this environment); "
            "pass fake=True for the deterministic stand-in"
        )
    n = len(payload)
    sample_rate = 8000 * (1 + n % 3)  # 8k / 16k / 24k
    n_channels = 1 + n % 2
    # 16-bit PCM assumption for the stand-in duration
    duration_ms = (n * 1000) // (sample_rate * 2 * n_channels)
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "duration_ms": duration_ms,
    }


def extract_audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-clip audio features via Arrow-batched mapInPandas — identical
    batch shape and scaling posture as extract_image_features."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_audio(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "n_channels": [f["n_channels"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=AUDIO_FEATURES_DDL
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plumbing*: expands each video row into frame
    descriptors (frame_no, byte_offset) without decoding — the shuffle/
    explode shape a real ffmpeg-backed sampler would use. Offsets are
    synthetic (payload length / every_n) pending a real demuxer."""
    n_frames = F.greatest(
        (F.length("payload") / F.lit(1024)).cast("int"), F.lit(1)
    )
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_no"),
    )
    return frames.select(
        "media_id", "frame_no", (F.col("n_bytes") * F.col("frame_no")).alias("byte_offset")
    )
