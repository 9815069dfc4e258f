"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the media itself is an opaque
``binary`` column (or a reference to object storage) with a typed metadata
struct beside it; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas`` so the raw bytes never
round-trip through row-at-a-time Python.

The decode step itself is STUBBED (no image/audio libs in this container):
``decode_stub=True`` produces a deterministic fake (dimensions derived from
the payload digest); ``decode_stub=False`` raises NotImplementedError where
a real libjpeg/ffmpeg call would go. Everything around it — schema, batch
shape, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: text bytes as the opaque
    payload (stand-in for image/audio bytes), typed metadata derived."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("byte_len"),
    )


def decode_media(media: DataFrame, decode_stub: bool = True,
                 feature_dim: int = 8) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    Real-decoder integration point: replace `_fake_decode` with the
    libjpeg/ffmpeg call. The Spark-side contract (schema in/out, batch
    iteration, null payloads passed through) does not change.
    """

    def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
        import hashlib

        d = hashlib.md5(payload).digest()
        width = 64 + d[0] % 192
        height = 64 + d[1] % 192
        n_frames = 1 + d[2] % 30
        feature = [round(b / 255.0, 6) for b in d[:feature_dim]]
        return width, height, n_frames, feature

    def decode_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires libjpeg/ffmpeg; "
                    "run with decode_stub=True in this environment"
                )
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "byte_len": pdf["byte_len"],
                "width": [], "height": [], "n_frames": [], "feature": [],
            }
            for payload in pdf["payload"]:
                if payload is None:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_frames"].append(None)
                    out["feature"].append(None)
                else:
                    w, h, n, f = _fake_decode(bytes(payload))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(n)
                    out["feature"].append(f)
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_nth: int = 5) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled frame
    index — pure explode/sequence, no Python."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    return (
        decoded.filter(F.col("media_type") == "video/mp4")
        .select("media_id", "n_frames", F.explode(frames).alias("frame_idx"))
    )
