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


# ---------------------------------------------------------------------------
# Real PPM (P6) decode + nearest-neighbor resize (r12)
# ---------------------------------------------------------------------------


def _ppm_media(spark, rows):
    """(media_id, payload-bytes) rows as MEDIA_SCHEMA."""
    return spark.createDataFrame(
        [(mid, b, ("image/x-portable-pixmap", len(b), "t")) for mid, b in rows],
        multimodal.MEDIA_SCHEMA,
    )


def test_parse_ppm_roundtrip_and_header_grammar():
    rgb = bytes(range(2 * 3 * 3))  # 2x3 image
    assert multimodal.parse_ppm(multimodal.encode_ppm(2, 3, rgb)) == (2, 3, rgb)
    # comments between header tokens are legal netpbm
    with_comment = b"P6\n# a comment\n2 3\n# another\n255\n" + rgb
    assert multimodal.parse_ppm(with_comment) == (2, 3, rgb)
    # rejections: wrong magic, truncated pixels, non-255 maxval, zero dim
    assert multimodal.parse_ppm(b"P5\n2 3\n255\n" + rgb) is None
    assert multimodal.parse_ppm(multimodal.encode_ppm(2, 3, rgb)[:-1]) is None
    assert multimodal.parse_ppm(b"P6\n2 3\n65535\n" + rgb) is None
    assert multimodal.parse_ppm(b"P6\n0 3\n255\n") is None
    assert multimodal.parse_ppm(b"") is None
    assert multimodal.parse_ppm(b"not an image at all") is None


def test_decode_image_real_stats_and_corrupt_quarantine(spark):
    # 2x2 image with known channel sums
    rgb = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    good = multimodal.encode_ppm(2, 2, rgb)
    media = _ppm_media(spark, [(1, good), (2, b"garbage bytes")])
    rows = {r["media_id"]: r for r in multimodal.decode_image(media).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (2, 2, 3)
    assert rows[1]["channel_sums"] == [10 + 40 + 70 + 100,
                                       20 + 50 + 80 + 110,
                                       30 + 60 + 90 + 120]
    # corrupt payload is DATA (NULL row), never an exception
    assert rows[2]["width"] is None and rows[2]["channel_sums"] is None


def test_resize_ppm_nearest_neighbor_exact(spark):
    # 4x2 source, downsample to 2x1: thumb (tx,0) samples (tx*4//2, 0*2//1)
    # = source pixels x=0 and x=2 of row 0
    px = [[(x + 1) * 10 + c for c in range(3)] for x in range(4)]  # row 0
    px += [[200 + x for _ in range(3)] for x in range(4)]          # row 1
    rgb = bytes(v for p in px for v in p)
    media = _ppm_media(spark, [(1, multimodal.encode_ppm(4, 2, rgb)),
                               (2, b"nope")])
    rows = {r["media_id"]: r for r in
            multimodal.resize_ppm_thumbnails(media, thumb_w=2, thumb_h=1).collect()}
    assert bytes(rows[1]["thumbnail"]) == bytes(px[0] + px[2])
    assert rows[1]["thumb_w"] == 2 and rows[1]["thumb_h"] == 1
    assert rows[2]["thumbnail"] is None


def test_synthetic_ppm_media_matches_its_documented_formula(spark):
    ids = spark.createDataFrame([(23,)], "media_id long")
    row = multimodal.synthetic_ppm_media(ids).collect()[0]
    m, w, h = 23, 8 + 23 % 5, 6 + 23 % 7
    parsed = multimodal.parse_ppm(bytes(row["payload"]))
    assert parsed is not None
    pw, ph, rgb = parsed
    assert (pw, ph) == (w, h)
    want = bytes((m * 7919 + y * 131 + x * 17 + c * 29) % 256
                 for y in range(h) for x in range(w) for c in range(3))
    assert rgb == want
    assert row["meta"]["mime"] == "image/x-portable-pixmap"


def test_parse_wav_roundtrip_and_chunk_walking():
    import struct

    samples = [0, 1, -1, 32767, -32768, 12345, -12345]
    payload = multimodal.encode_wav(8000, samples)
    rate, ch, data = multimodal.parse_wav(payload)
    assert (rate, ch) == (8000, 1)
    assert list(struct.unpack("<7h", data)) == samples

    # a real chunk walker must skip unknown chunks (LIST before fmt/data)
    # and honor the odd-size pad byte rule
    odd_chunk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded
    body = payload[12:]  # fmt + data chunks
    wrapped = b"RIFF" + struct.pack("<I", 4 + len(odd_chunk) + len(body)) + b"WAVE" + odd_chunk + body
    rate2, ch2, data2 = multimodal.parse_wav(wrapped)
    assert (rate2, ch2, data2) == (rate, ch, data)

    # malformed payloads quarantine to None, never raise
    assert multimodal.parse_wav(b"") is None
    assert multimodal.parse_wav(b"RIFF\x00\x00\x00\x00WAVE") is None  # no chunks
    assert multimodal.parse_wav(payload[:20]) is None  # truncated
    assert multimodal.parse_wav(b"OggS" + payload[4:]) is None  # wrong magic
    # fmt declaring 8-bit (non-PCM16) refuses
    bad_fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(bad_fmt)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt)
    assert multimodal.parse_wav(bad) is None
    # data chunk before fmt refuses (sample layout unknown)
    data_first = (b"RIFF" + struct.pack("<I", 4 + 8 + 4) + b"WAVE"
                  + b"data" + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    assert multimodal.parse_wav(data_first) is None


def test_decode_audio_real_stats_and_corrupt_quarantine(spark):
    ids = spark.createDataFrame([(3,), (17,)], "media_id long")
    media = multimodal.synthetic_wav_media(ids)
    rows = {r["media_id"]: r for r in multimodal.decode_audio(media).collect()}
    for m in (3, 17):
        n = 64 + m % 37
        vals = [((m * 7919 + i * 104729) % 65536) - 32768 for i in range(n)]
        r = rows[m]
        assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (8000, 1, n)
        assert r["sum_abs"] == sum(abs(v) for v in vals)
        assert r["peak_abs"] == max(abs(v) for v in vals)
        assert r["duration_ms"] == n * 1000 // 8000
    # corrupt payload -> NULL stats, not an exception
    junk = _media(spark, [(99, "not a wav at all")])
    r = multimodal.decode_audio(junk).collect()[0]
    assert r["media_id"] == 99 and r["n_samples"] is None and r["sum_abs"] is None


def test_decode_audio_stereo_frames_divide_channels(spark):
    import struct

    # hand-build a stereo clip: 4 interleaved L/R int16 pairs = 4 frames
    vals = [100, -100, 200, -200, 300, -300, 400, -400]
    data = struct.pack("<8h", *vals)
    fmt = struct.pack("<HHIIHH", 1, 2, 16000, 64000, 4, 16)
    payload = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
               + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    media = spark.createDataFrame([(1, bytearray(payload))], "media_id long, payload binary")
    r = multimodal.decode_audio(media.select(
        "media_id", "payload")).collect()[0]
    assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (16000, 2, 4)
    assert r["sum_abs"] == sum(abs(v) for v in vals)
    assert r["duration_ms"] == 4 * 1000 // 16000


def test_audio_frame_energy_fanout_exact(spark):
    ids = spark.createDataFrame([(5,)], "media_id long")
    media = multimodal.synthetic_wav_media(ids)
    rows = sorted(multimodal.audio_frame_energy(media, frame_samples=16).collect(),
                  key=lambda r: r["frame_idx"])
    n = 64 + 5 % 37  # 69 samples -> 5 frames: 16,16,16,16,5
    vals = [((5 * 7919 + i * 104729) % 65536) - 32768 for i in range(n)]
    assert [r["n_samples"] for r in rows] == [16, 16, 16, 16, 5]
    for f, r in enumerate(rows):
        chunk = vals[f * 16:(f + 1) * 16]
        assert r["energy"] == sum(v * v for v in chunk)
    # non-WAV payloads contribute no frames
    junk = _media(spark, [(99, "plain text")])
    assert multimodal.audio_frame_energy(junk).count() == 0


def test_image_ahash_and_banded_hamming_join(spark):
    """r13 aHash family: a perturbed single-pixel copy lands within 3
    bits and the banded Hamming join finds it (pigeonhole recall: any
    pair <= bands-1 bits shares a band); corrupt payloads yield NULL
    halves and are dropped from the pair stage; the guarantee-violating
    configuration refuses."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in range(0, 100, 20)], "media_id long")
    base = mm.synthetic_ppm_media(ids)
    pert = mm.synthetic_ppm_media(ids, perturb_origin=True).withColumn(
        "media_id", F.col("media_id") + F.lit(1000)
    )
    corrupt = spark.createDataFrame(
        [(5000, bytearray(b"not a ppm"), ("application/octet-stream", 9, "x"))],
        mm.MEDIA_SCHEMA,
    )
    hashes = mm.image_ahash(base.unionByName(pert).unionByName(corrupt))
    rows = {r["media_id"]: (r["hash_hi"], r["hash_lo"]) for r in hashes.collect()}
    assert rows[5000] == (None, None)  # quarantine
    # every hash half stays unsigned-32-bit
    assert all(
        0 <= v < 2**32 for hv in rows.values() for v in hv if v is not None
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.image_near_dup_pairs(hashes, max_hamming=3).collect()
    }
    # each planted twin is found within the bound
    for i in range(0, 100, 20):
        assert (i, i + 1000) in pairs and pairs[(i, i + 1000)] <= 3
    # popcount sanity against a Python recomputation for one pair
    hi_a, lo_a = rows[0]
    hi_b, lo_b = rows[1000]
    assert pairs[(0, 1000)] == bin(hi_a ^ hi_b).count("1") + bin(lo_a ^ lo_b).count("1")
    # recall past the pigeonhole bound refuses rather than silently missing
    with _pytest.raises(ValueError, match="pigeonhole"):
        mm.image_near_dup_pairs(hashes, max_hamming=4)
    with _pytest.raises(ValueError, match="thumb"):
        mm.image_ahash(base, thumb=4)


def test_audio_fingerprint_and_near_dup(spark):
    """r13 audio fingerprint family: single-sample-perturbed twins land
    within the Hamming bound and the (modality-agnostic) banded join
    finds them; clips with < 65 frames leave trailing bits 0; corrupt
    payloads quarantine as NULL halves."""
    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in range(1, 100, 20)], "media_id long")
    base = mm.synthetic_wav_media(ids, n_base=1040)
    pert = mm.synthetic_wav_media(ids, n_base=1040, perturb_first=True).withColumn(
        "media_id", F.col("media_id") + F.lit(1000)
    )
    short = mm.synthetic_wav_media(
        spark.createDataFrame([(5001,)], "media_id long")  # 64+ samples: 5 frames
    )
    corrupt = spark.createDataFrame(
        [(5000, bytearray(b"not a wav"), ("application/octet-stream", 9, "x"))],
        mm.MEDIA_SCHEMA,
    )
    hashes = mm.audio_fingerprint(
        base.unionByName(pert).unionByName(short).unionByName(corrupt)
    )
    rows = {r["media_id"]: (r["hash_hi"], r["hash_lo"]) for r in hashes.collect()}
    assert rows[5000] == (None, None)
    # short clip: ~5 frames -> only the low few delta bits can be set
    hi, lo = rows[5001]
    assert hi == 0 and lo < 2**8
    assert all(
        0 <= v < 2**32 for hv in rows.values() for v in hv if v is not None
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in mm.banded_hamming_pairs(hashes, max_hamming=3).collect()
    }
    for i in range(1, 100, 20):
        assert (i, i + 1000) in pairs and pairs[(i, i + 1000)] <= 3


def test_banded_hamming_join_hot_band_cap(spark):
    """r14 (r13 advice): perceptual hashes are NOT hash-uniform — flat
    images collapse to 0x0000/0xFFFF bands — so the banded Hamming join
    needs the same max_bucket_size escape hatch as every other propose
    stage.  A planted clique of m identical hashes proposes zero pairs
    under a cap < m; a true near pair sharing any NON-capped band still
    surfaces; cap < 2 refuses."""
    import pytest as _pytest

    from bulkfhirloader_spark.operators import multimodal as mm

    clique = [(i, 0, 0) for i in range(1, 11)]  # 10 identical all-zero hashes
    twin_a = (100, 0x9ABCDEF0, 0x12345678)
    twin_b = (101, 0x9ABCDEF0, 0x12345679)  # 1 bit apart, cold buckets
    # hot band 0 (val 0x1111) shared by 12 docs; 200/201 also share bands
    # 1-3 (cold, size-2 buckets), 1 bit apart inside band 0
    hot = [(200 + j, 0x0BAD0000 + j * 65536, 0x00031111) for j in range(12)]
    hot[1] = (201, hot[0][1], 0x00021111)  # twin of 200 via bands 1-3
    rows = clique + [twin_a, twin_b] + hot
    hashes = spark.createDataFrame(
        rows, "media_id long, hash_hi long, hash_lo long"
    )
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in mm.banded_hamming_pairs(hashes, max_hamming=3).collect()
    }
    assert {(i, j) for i in range(1, 11) for j in range(i + 1, 11)} <= uncapped
    assert (100, 101) in uncapped and (200, 201) in uncapped
    capped = {
        (r["id_a"], r["id_b"])
        for r in mm.banded_hamming_pairs(
            hashes, max_hamming=3, max_bucket_size=8
        ).collect()
    }
    # the m=10 clique (every band bucket size 10 > 8) proposes nothing
    assert not any(a <= 10 and b <= 10 for a, b in capped)
    # cold-bucket pair untouched; hot-band pair survives via bands 1-3
    assert (100, 101) in capped and (200, 201) in capped
    with _pytest.raises(ValueError, match="max_bucket_size"):
        mm.banded_hamming_pairs(hashes, max_hamming=3, max_bucket_size=1)


def test_audio_fingerprint_no_signal_quarantine(spark):
    """r14 (r13 advice): clips below min_frames carry no fingerprint
    signal — a zero-sample or one-frame WAV yields NULL halves (the same
    quarantine as corrupt payloads), never a valid all-zero hash that
    would collide every silent/short clip at hamming 0."""
    import pytest as _pytest

    from bulkfhirloader_spark.operators import multimodal as mm

    empty = mm.encode_wav(8000, [])
    one_frame = mm.encode_wav(8000, list(range(10)))  # 10 samples -> 1 frame
    two_frames = mm.encode_wav(8000, list(range(20)))  # 20 samples -> 2 frames
    media = spark.createDataFrame(
        [
            (1, bytearray(empty), ("audio/wav", len(empty), "t")),
            (2, bytearray(one_frame), ("audio/wav", len(one_frame), "t")),
            (3, bytearray(two_frames), ("audio/wav", len(two_frames), "t")),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = {
        r["media_id"]: (r["hash_hi"], r["hash_lo"])
        for r in mm.audio_fingerprint(media).collect()
    }
    assert rows[1] == (None, None)  # zero samples: no signal
    assert rows[2] == (None, None)  # one frame: zero deltas, no signal
    assert rows[3] != (None, None)  # >= min_frames: a real (short) hash
    # quarantined rows are dropped from the pair stage like corrupt ones
    assert mm.banded_hamming_pairs(
        mm.audio_fingerprint(media), max_hamming=3
    ).where("id_a in (1, 2) or id_b in (1, 2)").count() == 0
    with _pytest.raises(ValueError, match="min_frames"):
        mm.audio_fingerprint(media, min_frames=1)


def test_video_frame_ahash_and_near_dup(spark):
    """r14 video fingerprints: a frame-0 single-sample perturbed twin
    keeps every later frame hash-identical and lands within the Hamming
    bound on frame 0; malformed payloads contribute no rows
    (quarantine-by-absence, the video family's convention); aligned
    pairing counts close frames; config guards refuse."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from bulkfhirloader_spark.operators import multimodal as mm

    ids = spark.createDataFrame([(i,) for i in range(2, 100, 20)], "media_id long")
    base = mm.synthetic_y4m_media(ids)
    pert = mm.synthetic_y4m_media(ids, perturb_origin=True).withColumn(
        "media_id", F.col("media_id") + F.lit(1000)
    )
    corrupt = spark.createDataFrame(
        [(5000, bytearray(b"not video"), ("video/x-yuv4mpeg", 9, "x"))],
        mm.MEDIA_SCHEMA,
    )
    hashes = mm.video_frame_ahash(base.unionByName(pert).unionByName(corrupt))
    rows = {
        (r["media_id"], r["frame_idx"]): (r["hash_hi"], r["hash_lo"])
        for r in hashes.collect()
    }
    assert not any(mid == 5000 for mid, _ in rows)  # absence quarantine
    assert all(0 <= v < 2**32 for hv in rows.values() for v in hv)
    for i in range(2, 100, 20):
        nf = 2 + i % 3
        # non-perturbed frames are hash-identical across the twins
        for f in range(1, nf):
            assert rows[(i, f)] == rows[(i + 1000, f)]
        # frame 0: the fixture frames are 4-8 px wide, so the 8x8 thumb
        # UPSAMPLES — the origin sample feeds up to 4 cells, plus
        # mean-borderline flips: a dozen bits at most, not zero
        (ha, la), (hb, lb) = rows[(i, 0)], rows[(i + 1000, 0)]
        assert 0 < bin(ha ^ hb).count("1") + bin(la ^ lb).count("1") <= 12
    pairs = {
        (r["id_a"], r["id_b"]): r["n_close_frames"]
        for r in mm.video_near_dup_pairs(hashes, max_hamming=3).collect()
    }
    for i in range(2, 100, 20):
        # frames 1.. are identical (hamming 0); frame 0 may exceed the
        # bound on these tiny upsampled fixtures
        assert pairs[(i, i + 1000)] >= 2 + i % 3 - 1
    # min_close_frames raises the clip-level bar
    strict = mm.video_near_dup_pairs(hashes, max_hamming=3, min_close_frames=3)
    assert all(r["n_close_frames"] >= 3 for r in strict.collect())
    # any-frame pairing (time-shifted edits): counts all close frame
    # COMBINATIONS, so it's a superset of aligned — every aligned pair
    # still surfaces with n_close_frames at least the aligned count
    any_pairs = {
        (r["id_a"], r["id_b"]): r["n_close_frames"]
        for r in mm.video_near_dup_pairs(
            hashes, max_hamming=3, align="any"
        ).collect()
    }
    for pair, n in pairs.items():
        assert any_pairs.get(pair, 0) >= n, pair
    # a one-frame-shifted twin: frames 1.. of clip i equal frames 1.. of
    # twin i+1000 AND frame f of i vs frame f of the twin are close —
    # any-frame also matches cross-index identical content when present
    with _pytest.raises(ValueError, match="pigeonhole"):
        mm.video_near_dup_pairs(hashes, max_hamming=4)
    with _pytest.raises(ValueError, match="min_close_frames"):
        mm.video_near_dup_pairs(hashes, min_close_frames=0)
    with _pytest.raises(ValueError, match="align"):
        mm.video_near_dup_pairs(hashes, align="sliding")
    with _pytest.raises(ValueError, match="thumb"):
        mm.video_frame_ahash(base, thumb=4)


def test_decode_video_y4m_real_parse(spark):
    """r13 Y4M decode: known planes round-trip to exact sums; FRAME
    params and unknown header tags are tolerated; C444, torn frames, and
    garbage quarantine by absence."""
    from bulkfhirloader_spark.operators import multimodal as mm

    y = bytes(range(16))          # 4x4 Y plane, sum = 120
    u = bytes([10, 20, 30, 40])   # sum 100
    v = bytes([1, 2, 3, 4])       # sum 10
    good = mm.encode_y4m(4, 4, [(y, u, v), (v * 4, u, y[:4])])
    media = spark.createDataFrame(
        [
            (1, bytearray(good), ("video/x-yuv4mpeg", len(good), "t")),
            (2, bytearray(b"not video"), ("video/x-yuv4mpeg", 9, "t")),
            (3, bytearray(good[:-1]), ("video/x-yuv4mpeg", len(good) - 1, "t")),
        ],
        mm.MEDIA_SCHEMA,
    )
    rows = mm.decode_video(media).collect()
    got = {(r["media_id"], r["frame_idx"]): r for r in rows}
    assert set(got) == {(1, 0), (1, 1)}  # 2 and 3 contribute nothing
    r0 = got[(1, 0)]
    assert (r0["width"], r0["height"]) == (4, 4)
    assert (r0["y_sum"], r0["u_sum"], r0["v_sum"]) == (120, 100, 10)
    r1 = got[(1, 1)]
    assert r1["y_sum"] == sum(v) * 4 and r1["v_sum"] == sum(y[:4])
