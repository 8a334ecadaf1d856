"""Multimodal column handling (SURVEY §2B-K, north_star "multimodal
columns").

Design: media lives in opaque ``binary`` columns (or object-store
references) alongside typed metadata columns; metadata extraction is
JVM-side (length/hash), while decode/feature-extraction runs as
Arrow-batched ``mapInPandas`` — the only sane shape for CPU-heavy
per-item Python work at scale (one Python worker per partition, whole
Arrow batches across the boundary, no shuffle).

All three modalities ship REAL pure-Python decoders for their
classic uncompressed container: ``decode_image`` (netpbm PPM/PGM +
24-bpp Windows BMP), ``decode_wav`` (RIFF/WAVE 16-bit PCM audio) and
``iter_y4m_frames`` (YUV4MPEG2 video — 1:N frame sampling).
Compressed formats (PNG/JPEG, MP3/AAC, H.264) need codec libraries
that are not in this container; they route to the same seam — swap
the decoder, the Spark plumbing (Arrow batches, per-row error
isolation, 1:1 or 1:N output shape) does not change.  The test corpus
carries text, so the ``with_planted_*`` generators synthesize
deterministic payloads per doc_id: the bytes flowing through
mapInPandas are genuine media files any external tool could open, and
every decoded feature is re-derivable in the DuckDB oracle.
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


# --------------------------------------------------------------- audio ----
# RIFF/WAVE PCM: the classic uncompressed audio container, parseable
# with nothing but struct — same tier as PPM/BMP for images.  MP3/AAC
# need codec libs absent from this container and route to the same
# decoder seam.


def planted_wav_bytes(doc_id: int) -> bytes:
    """A deterministic REAL mono 16-bit PCM WAV file per doc_id:
    8 kHz, 800 + (doc_id % 5) * 160 samples, sample[i] =
    ((doc_id * 31 + i * 7) % 2048) - 1024 — every downstream feature
    re-derivable, and the bytes play in any audio tool."""
    rate, n = 8000, 800 + (doc_id % 5) * 160
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 31 + i * 7) % 2048 - 1024).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM payload: chunk walk to fmt + data, then
    int16 samples.  Raises ValueError on non-RIFF/non-PCM input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            try:
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            except struct.error as e:  # truncated chunk: decode error,
                raise ValueError(f"bad fmt chunk: {e}")  # not a crash
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    codec, channels, rate, _, _, bits = fmt
    if codec != 1 or bits != 16:
        raise ValueError(f"unsupported WAV codec={codec} bits={bits}")
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    n = len(samples) // channels
    absam = np.abs(samples)
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "peak": int(absam.max()) if n else None,
        "mean_abs": int(absam.sum() // len(samples)) if n else None,
    }


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("decode_ok", BooleanType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("peak", IntegerType()),
        StructField("mean_abs", IntegerType()),
    ]
)


def with_planted_audio(docs: DataFrame) -> DataFrame:
    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: planted_wav_bytes(int(i)))

    return docs.select("doc_id", gen(F.col("doc_id")).alias("payload"))


def audio_features(payloads: DataFrame) -> DataFrame:
    """WAV decode + signal features via mapInPandas (same Arrow-batch
    shape and per-row error isolation as ``extract_features``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    f = decode_wav(bytes(payload))
                    rows.append(
                        (int(doc_id), True, f["sample_rate"], f["channels"],
                         f["n_samples"], f["duration_ms"], f["peak"],
                         f["mean_abs"])
                    )
                except ValueError:
                    rows.append(
                        (int(doc_id), False, None, None, None, None, None,
                         None)
                    )
            yield pd.DataFrame(
                rows, columns=[s.name for s in AUDIO_SCHEMA.fields]
            )

    return payloads.mapInPandas(run, AUDIO_SCHEMA)


# --------------------------------------------------------------- video ----
# YUV4MPEG2 (y4m): the standard UNCOMPRESSED video interchange format
# (plain-text header + raw 4:2:0 planes per FRAME marker) — real
# frame-sampling without codec libraries.  H.264 etc. swap in at the
# same decoder seam.


def planted_y4m_bytes(doc_id: int) -> bytes:
    """A deterministic REAL y4m clip per doc_id: even WxH, 3 +
    (doc_id % 4) frames, luma Y[f][y][x] = (x + 2y + 5f + doc_id) %
    256, chroma planes constant 128.  mpv/ffplay can play these."""
    w = 16 + (doc_id % 8) * 2
    h = 16 + ((doc_id * 3) % 8) * 2
    n_frames = 3 + doc_id % 4
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420jpeg\n".encode("ascii")]
    ys, xs = np.mgrid[0:h, 0:w]
    chroma = np.full((h // 2) * (w // 2) * 2, 128, dtype=np.uint8).tobytes()
    for f in range(n_frames):
        luma = ((xs + 2 * ys + 5 * f + doc_id) % 256).astype(np.uint8)
        out.append(b"FRAME\n" + luma.tobytes() + chroma)
    return b"".join(out)


def iter_y4m_frames(payload: bytes):
    """Parse a y4m payload; yields (frame_idx, w, h, luma ndarray).
    Raises ValueError on malformed input."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    for tok in payload[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise ValueError("y4m header missing W/H")
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)  # C420
    pos, idx = nl + 1, 0
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {pos}")
        start = fnl + 1
        luma = np.frombuffer(payload[start : start + w * h], dtype=np.uint8)
        if len(luma) != w * h:
            raise ValueError("truncated frame")
        yield idx, w, h, luma.reshape(h, w)
        pos = start + frame_bytes
        idx += 1


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", IntegerType()),
    ]
)


def with_planted_video(docs: DataFrame) -> DataFrame:
    @F.pandas_udf(BinaryType())
    def gen(ids: pd.Series) -> pd.Series:
        return ids.map(lambda i: planted_y4m_bytes(int(i)))

    return docs.select("doc_id", gen(F.col("doc_id")).alias("payload"))


def sample_frames(payloads: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling via mapInPandas — the 1:N variant of the decode
    plumbing: each clip emits one row per kept frame (every
    ``every``-th, starting at 0) with per-frame luma stats.  Undecodable
    clips emit a single decode-failure row (frame_idx = -1) so failures
    stay visible without killing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    for idx, w, h, luma in iter_y4m_frames(bytes(payload)):
                        if idx % every:
                            continue
                        rows.append(
                            (int(doc_id), idx, w, h,
                             int(luma.sum()) // (w * h))
                        )
                except ValueError:
                    rows.append((int(doc_id), -1, None, None, None))
            yield pd.DataFrame(
                rows, columns=[s.name for s in FRAME_SCHEMA.fields]
            )

    return payloads.mapInPandas(run, FRAME_SCHEMA)
