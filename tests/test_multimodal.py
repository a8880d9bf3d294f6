"""Multimodal plumbing tests: schemas, batch shapes, stub gating, and
byte-exact frame hashing (oracle parity itself runs in test_oracle_parity)."""

from __future__ import annotations

import hashlib

import pytest

from data_engineering_etl_demo_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    from data_engineering_etl_demo_spark.catalog import load

    return M.synth_media(load(spark, SF_DIR, "documents"))


def _make_png(w: int, h: int, color_type: int = 2) -> bytes:
    """Well-formed PNG built from scratch (header + zlib'd scanlines)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    n_ch = {0: 1, 2: 3, 6: 4}[color_type]
    raw = b"".join(b"\x00" + bytes(w * n_ch) for _ in range(h))
    return (
        M.PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _make_wav(n_frames: int, rate: int = 22050, channels: int = 2) -> bytes:
    """Real WAV via the stdlib wave module."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(bytes(2 * channels * n_frames))
    return buf.getvalue()


def _make_gif(w: int, h: int, n_frames: int) -> bytes:
    """Minimal animated GIF: global color table + n image descriptors."""
    import struct

    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x80, 0, 0])
    out += bytes(6)  # global color table, depth 0 → 2 entries × 3 bytes
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control ext
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += b"\x02\x01\x44\x00"  # LZW min code + 1 data sub-block + end
    return out + b"\x3b"


def test_codec_decodes_real_png():
    meta = M.decode_with_codec(_make_png(17, 9, color_type=2), "image/png")
    assert meta == {
        "width": 17, "height": 9, "channels": 3, "n_frames": 1, "sample_rate": None,
    }
    assert M.decode_with_codec(_make_png(3, 4, color_type=6), "image/png")["channels"] == 4


def test_codec_decodes_real_wav():
    meta = M.decode_with_codec(_make_wav(480, rate=22050, channels=2), "audio/wav")
    assert meta["sample_rate"] == 22050
    assert meta["channels"] == 2
    assert meta["n_frames"] == 480
    assert meta["width"] is None


def test_codec_wav_data_chunk_before_fmt():
    """RIFF permits the data chunk ahead of fmt_; the frame count must be
    computed after the whole chunk walk, not only when fmt_ came first."""
    import struct

    normal = _make_wav(480, rate=22050, channels=2)
    # rebuild with chunks swapped: RIFF header + data + fmt_
    pos, chunks = 12, {}
    while pos + 8 <= len(normal):
        cid = normal[pos : pos + 4]
        (size,) = struct.unpack("<I", normal[pos + 4 : pos + 8])
        chunks[cid] = normal[pos : pos + 8 + size + (size & 1)]
        pos += 8 + size + (size & 1)
    body = chunks[b"data"] + chunks[b"fmt "]
    swapped = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    meta = M.decode_with_codec(swapped, "audio/wav")
    assert meta["n_frames"] == 480
    assert meta["channels"] == 2 and meta["sample_rate"] == 22050


def test_codec_decodes_real_gif_frame_count():
    meta = M.decode_with_codec(_make_gif(12, 7, n_frames=4), "video/gif")
    assert meta["width"] == 12 and meta["height"] == 7
    assert meta["n_frames"] == 4


def test_codec_rejects_unknown_container():
    with pytest.raises(ValueError):
        M.decode_with_codec(b"plain text payload", "image/unknown")
    # corrupt PNG: right magic, wrong IHDR placement
    with pytest.raises(ValueError):
        M.decode_with_codec(M.PNG_MAGIC + b"\x00" * 30, "image/png")


def test_decode_pipeline_uses_real_codec_for_real_bytes(spark):
    """End-to-end: real PNG/WAV/GIF payloads through the same Arrow-batched
    mapInPandas stage the synthetic path uses — real metadata comes out."""
    rows = [
        (1, _make_png(33, 21), "image/png"),
        (2, _make_wav(1000, rate=8000, channels=1), "audio/wav"),
        (3, _make_gif(5, 6, n_frames=3), "video/gif"),
        (4, b"not media at all " * 10, "image/synthetic"),  # falls back
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("media_type"), F.octet_length("payload").alias("n_bytes")
        ).alias("meta"),
    )
    got = {r["doc_id"]: r for r in M.decode_media_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (33, 21, 3)
    assert (got[2]["sample_rate"], got[2]["n_frames"]) == (8000, 1000)
    assert (got[3]["width"], got[3]["n_frames"]) == (5, 3)
    # fallback payload gets the synthetic length-derived metadata
    n = len(rows[3][1])
    assert got[4]["width"] == n % 64 + 1


def test_payload_is_binary_with_typed_meta(media):
    schema = dict(media.dtypes)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<media_type:string,n_bytes:")


def test_decode_schema_and_coverage(media):
    decoded = M.decode_media_features(media)
    assert decoded.schema == M.DECODED_SCHEMA
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert len(rows) == media.count()  # one feature row per payload
    for doc_id, r in rows.items():
        if doc_id % 3 == 1:  # audio
            assert r["width"] is None and r["sample_rate"] == 16000
        else:
            assert 1 <= r["width"] <= 64 and r["sample_rate"] is None
        assert (r["n_frames"] >= 2) == (doc_id % 3 == 2)


def test_decode_is_partitioning_invariant(media):
    one = sorted(map(tuple, M.decode_media_features(media.coalesce(1)).collect()))
    many = sorted(map(tuple, M.decode_media_features(media.repartition(7)).collect()))
    assert one == many


def test_frame_sample_explode_and_hashes(spark, media):
    frames = M.sample_frames(media).collect()
    assert frames, "video docs must yield frames"
    by_doc: dict[int, list] = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == {
        r["doc_id"] for r in media.select("doc_id").collect() if r["doc_id"] % 3 == 2
    }

    # Recompute one doc's frames from the raw text bytes.
    from data_engineering_etl_demo_spark.catalog import load

    doc_id = min(by_doc)
    text = (
        load(spark, SF_DIR, "documents").filter(f"doc_id = {doc_id}").collect()[0]["text"]
    )
    payload = text.encode("utf-8")
    n_frames = len(payload) % 7 + 2
    frame_size = len(payload) // n_frames
    expect = [
        hashlib.md5(
            payload[i * frame_size : (i + 1) * frame_size].hex().encode()
        ).hexdigest()
        for i in range(min(n_frames, M.MAX_SAMPLED_FRAMES))
    ]
    got = [r["frame_md5"] for r in sorted(by_doc[doc_id], key=lambda r: r["frame_idx"])]
    assert got == expect
    assert all(r["frame_n_bytes"] == frame_size for r in by_doc[doc_id])


def test_resize_subsampling_semantics(spark, media):
    rows = {r["doc_id"]: r for r in M.resize_images(media).collect()}
    assert rows and all(d % 3 == 0 for d in rows)
    from data_engineering_etl_demo_spark.catalog import load

    doc_id = min(rows)
    text = (
        load(spark, SF_DIR, "documents").filter(f"doc_id = {doc_id}").collect()[0]["text"]
    )
    payload = text.encode("utf-8")
    stride = max(1, len(payload) // M.RESIZE_TARGET_BYTES)
    resized = payload[::stride][: M.RESIZE_TARGET_BYTES]
    r = rows[doc_id]
    assert r["resized_n_bytes"] == len(resized) <= M.RESIZE_TARGET_BYTES
    assert r["resized_md5"] == hashlib.md5(resized.hex().encode()).hexdigest()
    assert r["new_width"] == len(resized) % 64 + 1


def test_audio_features_exact_sums(spark, media):
    rows = {r["doc_id"]: r for r in M.audio_features(media).collect()}
    assert rows and all(d % 3 == 1 for d in rows)
    from data_engineering_etl_demo_spark.catalog import load

    doc_id = min(rows)
    text = (
        load(spark, SF_DIR, "documents").filter(f"doc_id = {doc_id}").collect()[0]["text"]
    )
    payload = text.encode("utf-8")
    r = rows[doc_id]
    assert r["n_samples"] == len(payload)
    assert r["sum_amp"] == sum(payload)
    assert r["sum_sq"] == sum(b * b for b in payload)


def test_truncated_real_containers_fall_back_not_crash(spark):
    """A payload with a valid magic but truncated body must fall back to
    the synthetic decode, not blow up the Arrow batch."""
    from pyspark.sql import functions as F

    rows = [
        (1, _make_png(10, 10)[:20], "image/png"),  # cut inside IHDR
        (2, _make_wav(100)[:10], "audio/wav"),  # cut inside RIFF header
        (3, _make_gif(4, 4, 2)[:8], "video/gif"),  # cut inside screen desc
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("media_type"), F.octet_length("payload").alias("n_bytes")
        ).alias("meta"),
    )
    got = {r["doc_id"]: r for r in M.decode_media_features(df).collect()}
    assert set(got) == {1, 2, 3}
    for doc_id, payload, _ in rows:
        # fallback = length-derived fake metadata (image/video branches)
        assert got[doc_id]["n_bytes"] == len(payload)
