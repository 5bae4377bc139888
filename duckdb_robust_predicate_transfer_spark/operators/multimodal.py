"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata, processed in Arrow-batched Pandas UDFs
over mapInPandas.

The decode step itself is STUBBED (image/audio codecs are not in this
container — see decode_image_stub): it produces a deterministic fake
feature vector from the bytes. Everything around it — schema contract,
batch iteration, partition-parallel execution, binary handling through
Arrow — is real and tested, so swapping in a real codec (PIL/ffmpeg on
a cluster image) changes one function body and nothing else.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

#: schema of a multimodal asset table: opaque payload + typed metadata
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("media_type", StringType()),   # "image" | "audio" | ...
    StructField("payload", BinaryType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
])

FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("feature", ArrayType(FloatType())),
])


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as an opaque payload
    so the binary pipeline is exercised on real data shapes."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit(64).alias("width"), F.lit(64).alias("height"))


def decode_image_stub(payload: bytes, dim: int = 8) -> list:
    """STUB decode/feature-extract. A real implementation would decode
    the image and run a feature extractor; codecs are unavailable here,
    so this derives a deterministic pseudo-feature from a sha256 of the
    bytes — stable across runs/engines, which is exactly what the
    plumbing tests need.
    """
    h = hashlib.sha256(payload or b"").digest()
    return [((h[i] / 255.0) - 0.5) for i in range(dim)]


def extract_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, partition-parallel,
    constant memory per batch — the scale path for 100 TB of media."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            feats = [decode_image_stub(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda b: len(b or b"")),
                "feature": feats,
            })

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def frame_sample(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """'Frame sampling' shape: deterministic 1-in-N selection by id hash
    (for video you'd explode frames first; the selection operator is the
    same and stays JVM-side)."""
    return assets.filter(F.pmod(F.xxhash64("asset_id"), F.lit(every_n)) == 0)
