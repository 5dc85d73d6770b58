"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through ``mapInPandas`` Arrow
batches.

The Spark side — schemas, partitioning, UDF signatures, batch shapes —
is real and tested; the codec kernels are STUBS (this container has no
image/audio libraries): ``decode_stub=True`` runs a deterministic fake
decoder so the distributed plumbing can be exercised end-to-end, and
``decode_stub=False`` raises NotImplementedError where a real
Pillow/ffmpeg call would go.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def gen_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.sha2(F.concat(F.lit(seed), F.col("id")), 256), "utf-8").alias(
            "payload"
        ),
        F.create_map(F.lit("source"), F.lit("synthetic")).alias("meta"),
    )


def _fake_decode(payload: bytes, kind: str, dim: int) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo
    dimensions and a feature vector from the payload hash."""
    h = hashlib.sha256(payload).digest()
    feat = [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]
    return {
        "width": 64 + h[0] % 192 if kind == "image" else None,
        "height": 64 + h[1] % 192 if kind == "image" else None,
        "n_frames": 1 + h[2] % 300 if kind == "video" else None,
        "feature": feat,
    }


def extract_features(
    media: DataFrame, *, feature_dim: int = 16, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize media payloads via mapInPandas (Arrow batches).

    Partitioning contract: upstream should repartition by a size-aware
    key if payloads are skewed; each Arrow batch holds whole rows of
    (media_id, kind, payload), and output rows map 1:1.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/av/ffmpeg — not in container"
                )
            rows = []
            # zip over column arrays, not iterrows (iterrows materializes
            # a Series per row — ~50x slower on wide Arrow batches)
            for mid, kind, payload in zip(
                pdf["media_id"].values, pdf["kind"].values, pdf["payload"].values
            ):
                payload = bytes(payload) if payload is not None else b""
                d = _fake_decode(payload, kind, feature_dim)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "payload_sha": hashlib.sha256(payload).hexdigest(),
                        **d,
                    }
                )
            yield pd.DataFrame(rows)

    return media.select("media_id", "kind", "payload").mapInPandas(
        _batches, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    descriptors (real decode stubbed). Demonstrates the explode-side
    plumbing: one row per sampled frame, keyed for downstream joins."""
    vids = media.where(F.col("kind") == "video")
    # without real decode we derive a deterministic frame count
    n_frames = (F.pmod(F.xxhash64("media_id"), 300) + 1).cast("int")
    return vids.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
