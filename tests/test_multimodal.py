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


def test_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_with_codec(b"\x89PNG", "image/png")


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
