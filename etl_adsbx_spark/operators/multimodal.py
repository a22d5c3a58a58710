"""[EXT] Multimodal column plumbing (BASELINE.json north star).

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The decode kernel is pluggable (``decode_fn``): Pillow is
auto-selected for images when installed; without any media library the
pure-stdlib kernel still REALLY decodes the byte-layout formats of each
modality — PPM/BMP → RGB pixels, RIFF WAV → PCM frames, YUV4MPEG2 → raw
planar frames — and honestly raises for compressed formats (JPEG/PNG/MP3/
H.264 need Pillow/ffmpeg). Every Spark-side piece (schema, Arrow batch
shape, ``mapInPandas`` signature, partitioning) is real and tested either
way.

At 100 TB the pattern is: binary payloads stay columnar in parquet, the
decode UDF runs `mapInPandas` (Arrow batches, no per-row overhead), and
partition sizing is driven by payload bytes (``maxPartitionBytes``), not
row count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_sha", StringType(), False),
        StructField("feat_mean", DoubleType(), False),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Materialize a media table from the documents corpus: UTF-8 payload
    bytes + fake image metadata. Gives the binary-column path real data to
    flow through without bundled media files."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        (F.col("n_chars") % 640).alias("width"),
        (F.col("n_chars") % 480).alias("height"),
    )


def decode_media(payload: bytes, mime: str) -> bytes:
    """Decode kernel stub. A real deployment plugs Pillow/ffmpeg here.

    Raises for real media types (libs not installed); for the synthetic
    octet-stream payloads it is a deterministic identity, which keeps the
    full pipeline testable.
    """
    if mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            "media decoding requires image/audio libraries not present in this "
            "container; plug a real decoder into decode_media()"
        )
    return payload


def pillow_decode(payload: bytes, mime: str) -> bytes:
    """Pillow-backed image decode: raw RGB pixel bytes for ``image/*``
    payloads; everything else delegates to ``stdlib_decode`` (WAV PCM,
    identity for non-media, honest raise for compressed audio/video —
    those need an ffmpeg-backed kernel). Only importable where Pillow is
    installed; ``default_decode_kernel`` auto-selects it."""
    if mime.startswith("image/"):
        import io

        from PIL import Image

        return Image.open(io.BytesIO(payload)).convert("RGB").tobytes()
    return stdlib_decode(payload, mime)


def _ppm_tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens of a PNM payload
    (``#`` comments skipped), plus the offset of the byte AFTER the single
    whitespace that terminates the last token — where raster data begins."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    return toks, i + 1


def stdlib_decode(payload: bytes, mime: str) -> bytes:
    """Pure-stdlib media decode for formats that are plain byte layouts:
    binary PPM (P6) and uncompressed 24-bit BMP return row-major top-down
    RGB pixel bytes — byte-for-byte what Pillow's
    ``convert("RGB").tobytes()`` produces for the same image — and RIFF
    WAV returns the raw interleaved PCM frames (stdlib ``wave``). This is
    the real-decode branch that runs in CI without any media library;
    compressed formats (JPEG/PNG/MP3/video) still require an injected
    Pillow/ffmpeg kernel and raise honestly."""
    if mime in ("image/x-portable-pixmap", "image/ppm"):
        (magic, w, h, maxval), off = _ppm_tokens(payload, 4)
        if magic != b"P6" or int(maxval) != 255:
            raise NotImplementedError("stdlib PPM decode handles binary P6 maxval=255")
        w, h = int(w), int(h)
        raster = payload[off : off + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError(f"truncated PPM raster: {len(raster)} != {w * h * 3}")
        return bytes(raster)  # P6 raster is already top-down RGB
    if mime == "image/bmp":
        import struct

        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        (data_off,) = struct.unpack_from("<I", payload, 10)
        w, h = struct.unpack_from("<ii", payload, 18)
        (bpp,) = struct.unpack_from("<H", payload, 28)
        (compression,) = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or compression != 0:
            raise NotImplementedError("stdlib BMP decode handles uncompressed 24-bit")
        bottom_up, h = h > 0, abs(h)
        stride = (w * 3 + 3) // 4 * 4  # rows pad to 4-byte boundaries
        out = bytearray(w * h * 3)
        for row in range(h):
            src = data_off + (h - 1 - row if bottom_up else row) * stride
            px = payload[src : src + w * 3]
            out[row * w * 3 : (row + 1) * w * 3] = px
        out[0::3], out[2::3] = out[2::3], out[0::3]  # BGR -> RGB
        return bytes(out)
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            return w.readframes(w.getnframes())  # raw interleaved PCM
    if mime == "video/x-yuv4mpeg":
        # YUV4MPEG2: plain-text stream header, then per-frame "FRAME...\n"
        # markers followed by raw planar YUV — an uncompressed container,
        # so "decode" is pure byte accounting. Returns the concatenated
        # raw frame planes (what a model's frame sampler consumes).
        nl = payload.index(0x0A)
        header = payload[:nl].split(b" ")
        if header[0] != b"YUV4MPEG2":
            raise ValueError("not a YUV4MPEG2 payload")
        w = h = None
        cspace = b"420"  # y4m default when no C tag present
        for tag in header[1:]:
            if tag[:1] == b"W":
                w = int(tag[1:])
            elif tag[:1] == b"H":
                h = int(tag[1:])
            elif tag[:1] == b"C":
                cspace = tag[1:]
        if w is None or h is None:
            raise ValueError("YUV4MPEG2 header missing W/H")
        if cspace.startswith(b"444"):
            fsize = w * h * 3
        elif cspace.startswith(b"420"):
            fsize = w * h * 3 // 2
        elif cspace.startswith(b"422"):
            fsize = w * h * 2
        else:
            raise NotImplementedError(f"y4m colorspace C{cspace.decode()} unsupported")
        out, i = bytearray(), nl + 1
        while i < len(payload):
            fnl = payload.index(0x0A, i)
            if payload[i:fnl].split(b" ")[0] != b"FRAME":
                raise ValueError("malformed y4m FRAME marker")
            frame = payload[fnl + 1 : fnl + 1 + fsize]
            if len(frame) != fsize:
                raise ValueError(f"truncated y4m frame: {len(frame)} != {fsize}")
            out += frame
            i = fnl + 1 + fsize
        return bytes(out)
    if mime.startswith(("image/", "audio/", "video/")):
        raise NotImplementedError(
            f"stdlib decode kernel handles PPM/BMP/WAV/Y4M only; {mime} needs "
            "a Pillow/ffmpeg-backed kernel injected via decode_fn"
        )
    return payload


def default_decode_kernel():
    """The decode kernel every media operator defaults to: Pillow-backed
    if Pillow is importable in this environment, else the pure-stdlib
    PPM/BMP decoder (identity for non-media payloads, honest raise for
    formats that genuinely need a codec library).
    Operators take ``decode_fn`` so deployments can inject ffmpeg/custom
    codecs without touching any plan code; the kernel must be a
    module-level (picklable) ``bytes, mime -> bytes`` callable, shipped to
    executors inside the mapInPandas closure."""
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        return pillow_decode
    return stdlib_decode


def extract_features(media: DataFrame, decode_fn=None) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds many payloads; per-payload work
    is vectorized where possible. Output: byte count, sha256, and a fake
    'feature' (mean byte value) standing in for an embedding model.
    ``decode_fn`` swaps the decode kernel (default: auto-detected via
    ``default_decode_kernel``) without touching the Spark plumbing.
    """
    import hashlib

    decode_fn = decode_fn or default_decode_kernel()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [
                decode_fn(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes": [len(d) for d in decoded],
                    "payload_sha": [hashlib.sha256(d).hexdigest() for d in decoded],
                    "feat_mean": [
                        (sum(d) / len(d)) if len(d) else 0.0 for d in decoded
                    ],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("mime", StringType(), False),
        StructField("n_bytes_out", LongType(), False),
        StructField("resized_sha", StringType(), False),
    ]
)


def resize_media(media: DataFrame, target_bytes: int = 1024, decode_fn=None) -> DataFrame:
    """mapInPandas resize. For synthetic octet-stream payloads the
    deterministic fake is prefix-truncation to ``target_bytes`` (a
    'thumbnail' is a smaller deterministic function of the payload); a
    real deployment injects a Pillow `Image.resize` kernel via
    ``decode_fn`` (default: auto-detected via ``default_decode_kernel``)."""
    import hashlib

    decode_fn = decode_fn or default_decode_kernel()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                decode_fn(p, m)[:target_bytes]
                for p, m in zip(pdf["payload"], pdf["mime"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "n_bytes_out": [len(r) for r in resized],
                    "resized_sha": [hashlib.sha256(r).hexdigest() for r in resized],
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_frame_bytes", LongType(), False),
        StructField("frame_md5", StringType(), False),
    ]
)


def sample_frames(
    media: DataFrame, frame_bytes: int = 256, every_n: int = 2, decode_fn=None
) -> DataFrame:
    """mapInPandas frame sampling (1 input row → many frame rows — the
    UDTF-shaped fan-out a video pipeline needs). Kernel stub: a 'frame' is
    the i-th ``frame_bytes`` chunk of the decoded payload; keep every
    ``every_n``-th. A real deployment plugs ffmpeg keyframe extraction
    here via ``decode_fn``. Output partitioning follows the input — at
    100 TB size input partitions by payload bytes (maxPartitionBytes), and
    the fan-out stays within-partition (no shuffle)."""
    import hashlib

    decode_fn = decode_fn or default_decode_kernel()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "n_frame_bytes": [],
                "frame_md5": [],
            }
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                d = decode_fn(p, m)
                for i in range(0, (len(d) + frame_bytes - 1) // frame_bytes, every_n):
                    chunk = d[i * frame_bytes : (i + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["n_frame_bytes"].append(len(chunk))
                    out["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


KERNELS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kernel", StringType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("payload_hash", StringType(), False),
    ]
)


def media_kernels_pass(
    media: DataFrame,
    target_bytes: int = 1024,
    frame_bytes: int = 256,
    every_n: int = 2,
    decode_fn=None,
) -> DataFrame:
    """ALL kernels in ONE decode pass: each payload is decoded once and
    emits its resize row (kernel='resize', frame_idx=-1, sha256) plus its
    sampled frame rows (kernel='frame', md5 per chunk). At 100 TB the
    decode dominates — running resize_media and sample_frames separately
    would scan and decode every payload twice; this is the fused form.
    ``decode_fn`` swaps the codec kernel without touching the fusion."""
    import hashlib

    decode_fn = decode_fn or default_decode_kernel()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out: dict[str, list] = {
                "media_id": [], "kernel": [], "frame_idx": [],
                "n_bytes": [], "payload_hash": [],
            }
            for mid, p, m in zip(pdf["media_id"], pdf["payload"], pdf["mime"]):
                d = decode_fn(p, m)
                r = d[:target_bytes]
                out["media_id"].append(mid)
                out["kernel"].append("resize")
                out["frame_idx"].append(-1)
                out["n_bytes"].append(len(r))
                out["payload_hash"].append(hashlib.sha256(r).hexdigest())
                for i in range(0, (len(d) + frame_bytes - 1) // frame_bytes, every_n):
                    chunk = d[i * frame_bytes : (i + 1) * frame_bytes]
                    out["media_id"].append(mid)
                    out["kernel"].append("frame")
                    out["frame_idx"].append(i)
                    out["n_bytes"].append(len(chunk))
                    out["payload_hash"].append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, schema=KERNELS_SCHEMA)
