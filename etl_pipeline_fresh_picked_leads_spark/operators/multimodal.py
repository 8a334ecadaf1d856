"""Multimodal column handling (SURVEY §2B-K, north_star "multimodal
columns").

Design: media lives in opaque ``binary`` columns (or object-store
references) alongside typed metadata columns; metadata extraction is
JVM-side (length/hash), while decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` — the only sane shape for CPU-heavy
per-item Python work at scale (one Python worker per partition, whole
Arrow batches across the boundary, no shuffle).

``decode_image`` is a REAL pure-Python decoder for the two classic
uncompressed raster formats (netpbm PPM/PGM and 24-bpp Windows BMP):
struct-parsed headers, real pixel extraction, real width/height/
channel/mean-pixel features.  Compressed formats (PNG/JPEG) need a
codec library that is not in this container; they route to the same
seam — swap the decoder, the Spark plumbing does not change.  The
test corpus carries text, so ``with_planted_images`` synthesizes
deterministic PPM/BMP payloads per doc_id: the bytes flowing through
mapInPandas are genuine image files that any external tool could
open.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
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


# --------------------------------------------------------- decoders --------


def _decode_pnm(payload: bytes) -> dict:
    """P5 (binary graymap) / P6 (binary pixmap) decoder."""
    magic = payload[:2]
    channels = 3 if magic == b"P6" else 1
    # parse exactly three header ints, then locate the raster: it
    # starts one whitespace byte after the maxval token
    vals: list[int] = []
    i = 2
    n = len(payload)
    while len(vals) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i : i + 1] not in (b"\n", b"\r"):
                i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            vals.append(int(payload[i:j]))
            i = j
    if len(vals) < 3:
        raise ValueError("truncated PNM header")
    width, height, maxval = vals
    if not (0 < maxval < 65536) or width <= 0 or height <= 0:
        raise ValueError("invalid PNM dimensions")
    i += 1  # the single whitespace byte separating header and raster
    bytes_per_sample = 1 if maxval < 256 else 2
    expected = width * height * channels * bytes_per_sample
    raster = payload[i : i + expected]
    if len(raster) < expected:
        raise ValueError("truncated PNM raster")
    pixels = np.frombuffer(
        raster, dtype=np.uint8 if bytes_per_sample == 1 else ">u2"
    )
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "mean_byte": int(pixels.astype(np.int64).sum() // pixels.size),
    }


def _decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bpp bottom-up Windows BMP (BITMAPINFOHEADER)."""
    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height == 0:
        raise ValueError("invalid BMP dimensions")
    stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    need = data_offset + stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP raster")
    raster = np.frombuffer(
        payload, dtype=np.uint8, count=stride * height, offset=data_offset
    ).reshape(height, stride)[:, : width * 3]  # drop row padding
    if not top_down:
        raster = raster[::-1]
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "mean_byte": int(raster.astype(np.int64).sum() // raster.size),
    }


def decode_image(payload: bytes) -> dict:
    """Decode an image payload into real width/height/channels and the
    mean pixel-byte value.

    Pure-Python/numpy decoders for uncompressed formats: netpbm P5/P6
    and 24-bpp BMP.  Compressed formats (PNG ``\\x89PNG``, JPEG
    ``\\xff\\xd8``) need an external codec (Pillow/OpenCV, absent in
    this container) — they raise ValueError here and a library-backed
    decoder slots into this same function without touching the Spark
    plumbing in ``extract_features``.
    """
    magic = bytes(payload[:2])
    if magic in (b"P5", b"P6"):
        return _decode_pnm(payload)
    if magic == b"BM":
        return _decode_bmp(payload)
    raise ValueError(f"unsupported image format (magic={magic!r})")


# ------------------------------------------------ planted test images ------


def planted_image_bytes(doc_id: int) -> bytes:
    """A deterministic REAL image file for a doc_id: even ids get a
    binary PPM (P6), odd ids a 24-bpp BMP.  Pixel values are a fixed
    function of (x, y, doc_id), so every feature downstream is
    reproducible and independently checkable by any image viewer."""
    w = 8 + (doc_id % 24)
    h = 8 + ((doc_id * 7) % 24)
    ys, xs = np.mgrid[0:h, 0:w]
    base = (3 * xs + 5 * ys + doc_id) % 256
    rgb = np.stack(
        [base, (base + 85) % 256, (base + 170) % 256], axis=-1
    ).astype(np.uint8)
    if doc_id % 2 == 0:
        return f"P6\n{w} {h}\n255\n".encode("ascii") + rgb.tobytes()
    # BMP: BGR byte order, bottom-up rows, stride padded to 4 bytes
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = rgb[:, :, ::-1].reshape(h, w * 3)
    raster = rows[::-1].tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return header + raster


def with_planted_images(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with deterministic planted image files.

    Arrow-batched generation: at 100 TB the payload column arrives
    from storage; here a pandas UDF stands in for the fetch, and the
    bytes it produces are genuine PPM/BMP files."""

    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: planted_image_bytes(int(i)))

    return docs.select("doc_id", gen(F.col("doc_id")).alias("payload"))


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("decode_ok", BooleanType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("mean_byte", IntegerType()),
        StructField("resize_bucket", StringType()),
    ]
)


def extract_features(payloads: DataFrame) -> DataFrame:
    """Decode/feature-extract binary payloads via mapInPandas.

    Input: (doc_id, payload [, ...]).  Batch shape: each Arrow batch
    becomes one pandas DataFrame; the decoder runs per row inside the
    batch; output rows align 1:1 with inputs (a frame-sampling variant
    would emit 1:N — same plumbing).  Per-row error isolation mirrors
    the reference's per-file isolation (/root/reference/
    big_uery_handler.py:78-83): an undecodable payload yields NULL
    features and decode_ok=false instead of failing the batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                try:
                    f = decode_image(raw)
                    ok = True
                except ValueError:
                    f = {"width": None, "height": None, "channels": None,
                         "mean_byte": None}
                    ok = False
                w, h = f["width"], f["height"]
                bucket = (
                    f"{256 if w >= 256 else 128}x{256 if h >= 256 else 128}"
                    if ok
                    else None
                )
                out_rows.append(
                    (int(doc_id), len(raw), ok, w, h, f["channels"],
                     f["mean_byte"], bucket)
                )
            yield pd.DataFrame(
                out_rows,
                columns=[s.name for s in FEATURE_SCHEMA.fields],
            )

    return payloads.select("doc_id", "payload").mapInPandas(run, FEATURE_SCHEMA)
