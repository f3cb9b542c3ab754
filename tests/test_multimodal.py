"""Multimodal plumbing: the binary-column shapes (1->1 stats, 1->1 resize,
1->N frame sampling, feature extraction) with the deterministic stub
decoders asserted byte-for-byte."""

from __future__ import annotations

import hashlib

from bulkfhirloader_spark.operators import multimodal


def _media(spark, rows):
    docs = spark.createDataFrame(
        [(i, t, "unit-test") for i, t in rows],
        "doc_id long, text string, source string",
    )
    return multimodal.documents_as_media(docs)


def test_sample_frames_fanout(spark):
    media = _media(spark, [(1, "a" * 300), (2, "")])
    rows = multimodal.sample_frames(media, frame_bytes=128, max_frames=8).collect()
    frames = {}
    for r in rows:
        frames.setdefault(r["media_id"], []).append(r)
    # 300 bytes at 128/frame -> 3 frames of 128, 128, 44 bytes
    f1 = sorted(frames[1], key=lambda r: r["frame_idx"])
    assert [r["n_bytes"] for r in f1] == [128, 128, 44]
    assert f1[0]["frame_sha256"] == hashlib.sha256(b"a" * 128).hexdigest()
    # empty payload -> exactly one empty frame
    f2 = frames[2]
    assert len(f2) == 1 and f2[0]["n_bytes"] == 0
    assert f2[0]["frame_sha256"] == hashlib.sha256(b"").hexdigest()


def test_sample_frames_caps_at_max_frames(spark):
    media = _media(spark, [(1, "x" * 10_000)])
    rows = multimodal.sample_frames(media, frame_bytes=128, max_frames=8).collect()
    assert len(rows) == 8  # 79 possible chunks capped at 8


def test_resize_thumbnails_fixed_size(spark):
    media = _media(spark, [(1, "abcdefgh" * 100), (2, "")])
    rows = {r["media_id"]: r for r in
            multimodal.resize_thumbnails(media, thumb_w=8, thumb_h=8).collect()}
    assert all(len(bytes(r["thumbnail"])) == 64 for r in rows.values())
    assert rows[2]["thumbnail"] == bytes(64)  # empty payload -> zero grid
    # deterministic striding: step = 800 // 64 = 12 -> every 12th byte
    expected = (b"abcdefgh" * 100)[::12][:64]
    assert bytes(rows[1]["thumbnail"]) == expected.ljust(64, b"\x00")


def test_extract_features_unit_histogram(spark):
    media = _media(spark, [(1, "hello world")])
    row = multimodal.extract_features(media).collect()[0]
    assert row["n_bytes"] == 11
    assert len(row["feature"]) == 8
    assert abs(sum(row["feature"]) - 1.0) < 1e-6  # normalized histogram
