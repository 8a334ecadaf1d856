"""Multimodal column handling (SURVEY §2B-K, north_star "multimodal
columns").

Design: media lives in opaque ``binary`` columns (or object-store
references) alongside typed metadata columns; metadata extraction is
JVM-side (length/hash), while decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` — the only sane shape for CPU-heavy
per-item Python work at scale (one Python worker per partition, whole
Arrow batches across the boundary, no shuffle).

The actual image/audio decoders are NOT in this container, so
``decode_image`` is stubbed (NotImplementedError) with a clearly
marked deterministic fake used by the feature pipeline; the Spark
plumbing — schema, batching, partitioning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """Model each document's content as an opaque binary payload (in a
    real pipeline this column comes from ``spark.read.format
    ("binaryFile")`` or an object-store fetch)."""
    return docs.select(
        "doc_id",
        "lang",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def payload_metadata(docs: DataFrame) -> DataFrame:
    """Typed metadata for binary payloads: size, content hashes,
    magic-byte prefix — all JVM-side, no decode needed.  This is the
    dedup/shard key layer for media at scale."""
    with_bin = with_binary_payload(docs)
    return with_bin.select(
        "doc_id",
        "lang",
        F.length("payload").alias("n_bytes"),
        F.md5("payload").alias("md5_hex"),
        F.sha2("payload", 256).alias("sha256_hex"),
        F.hex(F.substring("payload", 1, 4)).alias("magic_hex"),
    )


def decode_image(payload: bytes) -> dict:
    """Decode an image payload into pixels + dimensions.

    STUB: real decoding needs an image library (Pillow/OpenCV) that is
    not available in this environment.  The Spark pipeline calls
    ``_fake_decode`` instead, which derives deterministic pseudo-
    metadata from the bytes so the plumbing is exercised end-to-end.
    """
    raise NotImplementedError(
        "image decoding requires Pillow/OpenCV; wire a real decoder "
        "here and extract_features() needs no other change"
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decoder: pseudo width/height/channel stats
    derived from payload bytes — stands in for decode_image until a
    real codec is installed."""
    n = len(payload)
    return {
        "width": 64 + (n % 512),
        "height": 64 + ((n * 7) % 512),
        "channels": 3,
        "mean_byte": (sum(payload[:256]) // max(1, min(n, 256))) if n else 0,
    }


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_byte", IntegerType()),
        StructField("resize_bucket", StringType()),
    ]
)


def extract_features(docs: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Decode/feature-extract binary payloads via mapInPandas.

    Batch shape: each Arrow batch becomes one pandas DataFrame; the
    decoder runs per row inside the batch; output rows align 1:1 with
    inputs (a frame-sampling variant would emit 1:N — same plumbing).
    """
    decoder = decode_image if use_real_decoder else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "channels": [f["channels"] for f in feats],
                    "mean_byte": [f["mean_byte"] for f in feats],
                }
            )
            out["resize_bucket"] = [
                f"{256 if w >= 256 else 128}x{256 if h >= 256 else 128}"
                for w, h in zip(out["width"], out["height"])
            ]
            yield out

    payloads = with_binary_payload(docs).select("doc_id", "payload")
    return payloads.mapInPandas(run, FEATURE_SCHEMA)
