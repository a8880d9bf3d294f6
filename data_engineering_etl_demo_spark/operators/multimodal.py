"""Multimodal-column operators: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: media lives in a BINARY column
(or object-store pointers), metadata in a typed struct column; decode /
feature-extract / frame-sample run as Arrow-batched ``mapInPandas`` stages so
Python touches each payload exactly once per batch, and everything before and
after stays JVM-side.

This container ships no codec libraries (PIL/ffmpeg/librosa), but three
containers are decoded for real with pure-Python parsers
(``decode_with_codec``): PNG (IHDR → dimensions/channels), WAV (RIFF fmt_/
data → channels, sample rate, frame count) and GIF (block walk → true
animated frame counts).  Payloads without a recognized magic fall back to
``_fake_decode`` — a DETERMINISTIC stand-in deriving metadata from the
payload bytes — which is what the sf testdata's synthetic (utf-8 text)
payloads exercise, keeping the oracle-checked rows stable.  Formats needing
a full codec stack (JPEG entropy decode, MP4) stay out of scope.  The
plumbing — schemas, partitioning, UDF signatures, Arrow batch shapes, the
1→N frame explode — is shared by both paths, and every synthetic-path value
is mirrored in DuckDB SQL (plans/multimodal.py) so the driver hash-checks
the full path.

Byte-exact oracle trick: DuckDB cannot md5 or slice BLOBs, so frame hashes
are md5 over the LOWERCASE-HEX encoding of the byte slice; hex offsets are
2× byte offsets, which makes string slicing byte-exact in both engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image/synthetic", "audio/synthetic", "video/synthetic")

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_n_bytes", T.LongType()),
        T.StructField("frame_md5", T.StringType()),
    ]
)

MAX_SAMPLED_FRAMES = 3


def synth_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, payload: binary, meta: struct).  The payload is
    the utf-8 encoding of the text (a deterministic fake media blob); the
    media type cycles by doc_id so all three modalities are exercised."""
    media_type = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(MEDIA_TYPES[0]))
        .when(F.col("doc_id") % 3 == 1, F.lit(MEDIA_TYPES[1]))
        .otherwise(F.lit(MEDIA_TYPES[2]))
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            media_type.alias("media_type"),
            F.octet_length(F.col("text")).alias("n_bytes"),
        ).alias("meta"),
    )


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type → sample channels (spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _parse_png(payload: bytes) -> dict:
    """Pure-Python PNG header decode: the IHDR chunk is required to be
    first (offset 8), carrying big-endian width/height and the color type
    that fixes the channel count."""
    import struct

    if len(payload) < 33 or payload[12:16] != b"IHDR":
        raise ValueError("PNG: missing IHDR at offset 12")
    width, height = struct.unpack(">II", payload[16:24])
    color_type = payload[25]
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG: invalid color type {color_type}")
    return {
        "width": width,
        "height": height,
        "channels": _PNG_CHANNELS[color_type],
        "n_frames": 1,
        "sample_rate": None,
    }


def _parse_wav(payload: bytes) -> dict:
    """Pure-Python WAV (RIFF) decode: walk the chunk list for fmt_
    (channels, sample rate, bits/sample) and data (payload size →
    n_frames = samples per channel)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("WAV: not a RIFF/WAVE container")
    pos, channels, rate, bits, data_size = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            _, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            # record the size only — RIFF permits data BEFORE fmt_, so the
            # frame math waits until the walk has seen both chunks
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or rate is None:
        raise ValueError("WAV: no fmt chunk")
    n_frames = (
        data_size // (channels * max(bits // 8, 1))
        if data_size is not None and channels
        else 0
    )
    return {
        "width": None,
        "height": None,
        "channels": channels,
        "n_frames": n_frames,
        "sample_rate": rate,
    }


def _parse_gif(payload: bytes) -> dict:
    """Pure-Python GIF decode with real frame counting: read the logical
    screen descriptor, then walk the block stream — skipping color tables,
    extension sub-blocks and LZW data — counting image descriptors (0x2C).
    An animated GIF is the one genuinely parseable multi-frame container
    with no codec library, which makes it the video-path test vehicle."""
    import struct

    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("GIF: bad signature")
    width, height = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 × 2^(depth+1) bytes
        pos += 3 * (2 << (flags & 0x07))

    def skip_subblocks(p: int) -> int:
        while p < len(payload) and payload[p] != 0:
            p += 1 + payload[p]
        return p + 1  # past the 0x00 terminator

    n_frames = 0
    while pos < len(payload):
        block = payload[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label byte, then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor
            n_frames += 1
            lflags = payload[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos = skip_subblocks(pos + 1)  # LZW min-code byte + data
        else:
            raise ValueError(f"GIF: unknown block 0x{block:02x} at {pos}")
    if n_frames == 0:
        raise ValueError("GIF: no image descriptors")
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "n_frames": n_frames,
        "sample_rate": None,
    }


def decode_with_codec(payload: bytes, media_type: str) -> dict:
    """Real-codec entry point: pure-Python container parsers for PNG
    (image), WAV (audio) and GIF (image/video with true frame counts),
    dispatched on magic bytes.  Formats that need a full codec stack
    (JPEG entropy decode, MP4/ffmpeg, MP3) are out of scope in this
    container and raise ValueError, which callers treat as
    not-a-recognized-container."""
    if payload[:8] == PNG_MAGIC:
        return _parse_png(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return _parse_wav(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return _parse_gif(payload)
    raise ValueError(f"unrecognized media container for {media_type}")


def _decode_any(payload: bytes, media_type: str) -> dict:
    """Dispatch: real container parse when the payload carries a known
    magic (PNG/WAV/GIF), else the deterministic synthetic stand-in.  The
    sf testdata's synthetic payloads are utf-8 text and never match a
    magic, so the oracle-checked rows flow through _fake_decode unchanged
    while real media bytes get real decoding.  Truncated/corrupt real
    containers surface as struct/index errors from the parsers — treated
    the same as not-a-container (fall back, never crash the Arrow batch)."""
    import struct

    try:
        return decode_with_codec(payload, media_type)
    except (ValueError, IndexError, struct.error):
        return _fake_decode(payload, media_type)


def _fake_decode(payload: bytes, media_type: str) -> dict:
    """Deterministic stand-in for decode_with_codec: metadata derived purely
    from len(payload), so the DuckDB oracle can mirror it from octet_length."""
    n = len(payload)
    if media_type.startswith("image"):
        return {"width": n % 64 + 1, "height": n // 64 % 64 + 1,
                "channels": 3, "n_frames": 1, "sample_rate": None}
    if media_type.startswith("audio"):
        return {"width": None, "height": None,
                "channels": 1, "n_frames": 1, "sample_rate": 16000}
    return {"width": n % 64 + 1, "height": n // 64 % 64 + 1,
            "channels": 3, "n_frames": n % 7 + 2, "sample_rate": None}


def decode_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: one pandas pass per batch over the binary
    payloads → typed feature rows (DECODED_SCHEMA)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                # empty Arrow batch: pd.DataFrame([]) has no columns and
                # the astype below would KeyError
                continue
            feats = [
                _decode_any(p, mt)
                for p, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "media_type", pdf["media_type"].values)
            out.insert(2, "n_bytes", [len(p) for p in pdf["payload"]])
            yield out.astype(
                {"width": "Int32", "height": "Int32", "channels": "Int32",
                 "n_frames": "Int32", "sample_rate": "Int32"}
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    )
    return flat.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


RESIZE_TARGET_BYTES = 256

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("resized_n_bytes", T.LongType()),
        T.StructField("resized_md5", T.StringType()),
    ]
)


def resize_images(
    media: DataFrame, target_bytes: int = RESIZE_TARGET_BYTES
) -> DataFrame:
    """Image 'resize' with the codec stubbed: deterministic byte
    SUBSAMPLING stands in for pixel resampling — stride = max(1,
    n // target), resized = payload[::stride][:target] — so the plumbing
    (binary in, smaller binary out, metadata recomputed, md5 of the new
    payload) is real and byte-exact, while a production build swaps
    ``decode_with_codec`` + a real resampler into the same kernel.  One
    Arrow pass; new dimensions derive from the resized length by the same
    rule _fake_decode uses."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                stride = max(1, n // target_bytes)
                resized = payload[::stride][:target_bytes]
                rn = len(resized)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": n,
                        "width": n % 64 + 1,
                        "height": n // 64 % 64 + 1,
                        "new_width": rn % 64 + 1,
                        "new_height": rn // 64 % 64 + 1,
                        "resized_n_bytes": rn,
                        "resized_md5": hashlib.md5(
                            resized.hex().encode()
                        ).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in RESIZED_SCHEMA.fields],
            ).astype(
                {"width": "Int32", "height": "Int32",
                 "new_width": "Int32", "new_height": "Int32"}
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    ).filter(F.col("media_type").startswith("image"))
    return flat.mapInPandas(resize_batches, schema=RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("sum_amp", T.LongType()),
        T.StructField("sum_sq", T.LongType()),
        T.StructField("mean_amp", T.DoubleType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction with the codec stubbed: payload bytes are
    read as uint8 PCM samples (a real build would librosa-decode first,
    same kernel shape) and reduced to amplitude statistics — counts and
    sums as exact integers, the mean as floor-truncated double, so the
    DuckDB oracle reproduces every value from the hex encoding."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(samples)
                s = int(samples.sum())
                sq = int((samples * samples).sum())
                mean = float(np.floor(s / n * 1e6) / 1e6) if n else 0.0
                rows.append(
                    {"doc_id": doc_id, "n_samples": n, "sum_amp": s,
                     "sum_sq": sq, "mean_amp": mean}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    flat = media.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    ).filter(F.col("media_type").startswith("audio"))
    return flat.mapInPandas(feat_batches, schema=AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, max_frames: int = MAX_SAMPLED_FRAMES) -> DataFrame:
    """1→N frame-sampling explode for video payloads: each row yields up to
    ``max_frames`` equal-size byte slices, hashed as md5(lowercase-hex).
    Demonstrates batch-shape change (one input row → several output rows)
    inside a single Arrow pass."""

    def explode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            import hashlib

            rows = []
            for doc_id, payload, media_type in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if not media_type.startswith("video"):
                    continue
                n_frames = _decode_any(payload, media_type)["n_frames"]
                frame_size = len(payload) // n_frames
                for idx in range(min(n_frames, max_frames)):
                    chunk = payload[idx * frame_size : (idx + 1) * frame_size]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_idx": idx,
                            "frame_n_bytes": len(chunk),
                            "frame_md5": hashlib.md5(
                                chunk.hex().encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_n_bytes", "frame_md5"]
            ).astype({"frame_idx": "Int32"})

    flat = media.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    )
    return flat.mapInPandas(explode_batches, schema=FRAME_SCHEMA)


PATCH_GRID = 4  # 4×4 = 16 patches per image (ViT-style tiling)

PATCH_SCHEMA = (
    "doc_id long, patch_row int, patch_col int, patch_n_bytes long, "
    "patch_sum long, patch_md5 string"
)


def patch_grid(media: DataFrame, grid: int = PATCH_GRID) -> DataFrame:
    """ViT-style patch tiling for image payloads: each image explodes into
    grid² byte-range patches (patch p covers [⌊p·n/g²⌋, ⌊(p+1)·n/g²⌋) —
    exact integer boundaries, so the oracle reproduces every slice), with
    per-patch byte count, exact amplitude sum, and md5 of the
    lowercase-hex slice.  One Arrow pass, 1→16 row explode — the batch
    prep a vision-transformer pipeline runs before patch embedding."""

    n_patches = grid * grid

    def patch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload, media_type in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                if not media_type.startswith("image"):
                    continue
                n = len(payload)
                for p in range(n_patches):
                    lo = p * n // n_patches
                    hi = (p + 1) * n // n_patches
                    chunk = payload[lo:hi]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "patch_row": p // grid,
                            "patch_col": p % grid,
                            "patch_n_bytes": len(chunk),
                            "patch_sum": sum(chunk),
                            "patch_md5": hashlib.md5(
                                chunk.hex().encode()
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "patch_row",
                    "patch_col",
                    "patch_n_bytes",
                    "patch_sum",
                    "patch_md5",
                ],
            ).astype({"patch_row": "Int32", "patch_col": "Int32"})

    flat = media.select(
        "doc_id", "payload", F.col("meta.media_type").alias("media_type")
    )
    return flat.mapInPandas(patch_batches, schema=PATCH_SCHEMA)
