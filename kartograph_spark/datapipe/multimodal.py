"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract run as Arrow-batched pandas UDFs over
``mapInPandas`` so the batch shape, schema, and partitioning are real even
though the actual codec is stubbed (image/audio libraries are not in this
container — ``decode_image`` raises NotImplementedError; the deterministic
fake extractor stands in so the Spark-side pipeline is testable
end-to-end).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("sig", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def as_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap documents as a media table: text bytes stand in for the opaque
    payload; width/height are deterministic fake metadata."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        F.col("doc_id").cast("long"),
        F.lit("image/fake").alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
        (F.pmod("doc_id", F.lit(640)) + 1).cast("int").alias("width"),
        (F.pmod("doc_id", F.lit(480)) + 1).cast("int").alias("height"),
    )


def decode_image(payload: bytes) -> object:
    """Real codec entry point — STUB: the container has no image libs.
    On a production cluster this dispatches to PIL/libvips inside the
    same mapInPandas batch loop."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; wire PIL/opencv here on a real cluster"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": payload.map(len).astype("int64"),
                # deterministic fake 'embedding signature' of the payload
                "sig": payload.map(lambda b: hashlib.md5(b).hexdigest()),
                # fake frame sampling: 1 frame per 64 payload bytes, >= 1
                "n_frames": (payload.map(len) // 64 + 1).astype("int32"),
            }
        )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` keeps the payload inside the executor (never
    collected); at cluster scale partition by content-addressable id so
    co-located batches stay cache-friendly."""
    return media.select("doc_id", "payload").mapInPandas(
        _feature_batches, schema=FEATURE_SCHEMA
    )


def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: wrap -> extract; used by __spark_entry__ with a DuckDB
    oracle (octet_length + md5 reproduce the fake extractor exactly)."""
    return extract_features(as_media_table(spark, sf_dir))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _resize_batches(target: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # aspect-preserving target box; the pixel resample itself is the
            # stubbed codec step (decode_image) — payload passes through so
            # the Spark-side schema/batch shape is the production one.
            # floor (not round): exact across engines, no half-even skew.
            scale = (target / pdf[["width", "height"]].max(axis=1)).clip(upper=1.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "out_width": np.floor(pdf["width"] * scale).astype("int32"),
                    "out_height": np.floor(pdf["height"] * scale).astype("int32"),
                    "payload": pdf["payload"],
                }
            )

    return gen


def resize_media(media: DataFrame, target: int = 224) -> DataFrame:
    """Resize planning over the binary column (aspect-preserving fit into
    ``target``x``target``): real metadata math, stubbed pixel codec."""
    return media.select(
        "doc_id", "width", "height", "payload"
    ).mapInPandas(_resize_batches(target), schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, stride: int = 64, max_frames: int = 8
) -> DataFrame:
    """UDTF-shaped frame sampling: one binary payload -> up to
    ``max_frames`` fixed-stride frames (the video analog; byte-slice
    windows stand in for the stubbed codec).

    Entirely JVM-side (whole-stage codegen): frame indices come from
    ``sequence()`` + ``explode`` and the byte windows from ``substring``
    on the binary column — no Python in the path at all.  The per-frame
    decode/feature step that would need a codec runs as a downstream
    Arrow-batched pandas UDF over these rows (see ``extract_features``).
    """
    n = F.least(
        F.lit(max_frames),
        F.greatest(F.lit(1), F.floor(F.octet_length("payload") / stride)),
    ).cast("int")
    exploded = media.select(
        "doc_id",
        "payload",
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    )
    return exploded.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx").cast("long") * stride).alias("frame_offset"),
        F.expr(
            f"substring(payload, frame_idx * {stride} + 1, {stride})"
        ).alias("frame"),
    )
