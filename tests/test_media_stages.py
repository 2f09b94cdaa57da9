"""Media stages over REAL stdlib codecs (stages/codecs.py + media.py):
BMP/PPM/PGM image decode, PCM WAV audio decode, FVID frame demux."""

import numpy as np
import pyarrow as pa

from smartreader_ray.stages.codecs import (
    MediaDecodeError,
    bmp_decode,
    bmp_encode,
    ppm_decode,
    ppm_encode,
    sniff_media_format,
    wav_decode,
    wav_encode,
)
from smartreader_ray.stages.media import (
    AudioFeatureStage,
    ByteHistogramFeatures,
    FrameSampleStage,
    ImageResizeStage,
    ImageStatsFeatures,
    fvid_encode,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


def _media_batch():
    img = bmp_encode(_img(512, 256, seed=1))
    vid = fvid_encode([bmp_encode(_img(8, 4, seed=i)) for i in range(25)])
    return pa.table(
        {
            "doc_id": pa.array(["d1", "d2", "d3"], type=pa.string()),
            "media_ref": pa.array(["a.bmp", "b.vid", "broken"], type=pa.string()),
            "payload": pa.array([img, vid, b"garbage"], type=pa.binary()),
        }
    )


# ---------------------------------------------------------------------------
# codec round trips
# ---------------------------------------------------------------------------

def test_bmp_round_trip_including_padded_strides():
    # widths 1..5 exercise every 4-byte row-padding remainder
    for w in (1, 2, 3, 4, 5, 33):
        px = _img(w, 3, seed=w)
        assert np.array_equal(bmp_decode(bmp_encode(px)), px)


def test_bmp_top_down_rows():
    px = _img(5, 4, seed=9)
    enc = bytearray(bmp_encode(px))
    import struct

    h = struct.unpack_from("<i", enc, 22)[0]
    struct.pack_into("<i", enc, 22, -h)  # declare top-down
    body_off = struct.unpack_from("<I", enc, 10)[0]
    stride = (5 * 3 + 3) & ~3
    rows = [bytes(enc[body_off + i * stride: body_off + (i + 1) * stride])
            for i in range(h)]
    enc[body_off:] = b"".join(reversed(rows))
    assert np.array_equal(bmp_decode(bytes(enc)), px)


def test_ppm_pgm_round_trip_and_comments():
    px = _img(7, 5, seed=2)
    assert np.array_equal(ppm_decode(ppm_encode(px)), px)
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert np.array_equal(ppm_decode(ppm_encode(gray)), gray)
    with_comment = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
    assert ppm_decode(with_comment).shape == (1, 2, 3)


def test_wav_round_trip_mono_stereo():
    s = (np.arange(997) * 37 % 2001 - 1000).astype(np.int16)
    fr, nch, out = wav_decode(wav_encode(s, 8000))
    assert (fr, nch) == (8000, 1) and np.array_equal(out, s)
    st = np.stack([s[:100], -s[:100]], axis=1)
    fr, nch, out = wav_decode(wav_encode(st.reshape(-1), 44100, n_channels=2))
    assert (fr, nch) == (44100, 2) and np.array_equal(out, st.reshape(-1))


def test_codecs_reject_malformed():
    import pytest

    for bad in (b"", b"BMshort", b"P6\n3 3\n255\nxy", b"RIFF1234WAVEjunk",
                b"garbage" * 3):
        for dec in (bmp_decode, ppm_decode, wav_decode):
            with pytest.raises(MediaDecodeError):
                dec(bad)
    assert sniff_media_format(b"BM\x00") == "bmp"
    assert sniff_media_format(b"P5rest") == "pgm"
    assert sniff_media_format(b"nope") == "unknown"


# ---------------------------------------------------------------------------
# stages
# ---------------------------------------------------------------------------

def test_resize_real_bmp_exact_nearest_neighbor():
    px = _img(512, 256, seed=1)
    out = ImageResizeStage(max_dim=128)(_media_batch())
    rows = {r["media_ref"]: r for r in out.to_pylist()}
    ok = rows["a.bmp"]
    assert (ok["src_width"], ok["src_height"]) == (512, 256)
    assert (ok["width"], ok["height"]) == (128, 64)
    got = bmp_decode(ok["payload"])
    ref = px[(np.arange(64) * 256) // 64][:, (np.arange(128) * 512) // 128]
    assert np.array_equal(got, ref)  # bit-exact nearest-neighbor contract
    # non-image payloads -> error rows, never exceptions
    assert "unsupported image payload" in rows["broken"]["error"]
    assert rows["b.vid"]["error"]


def test_resize_ppm_and_small_noop():
    px = _img(100, 50, seed=3)
    batch = pa.table(
        {
            "doc_id": ["d"], "media_ref": ["x.ppm"],
            "payload": pa.array([ppm_encode(px)], type=pa.binary()),
        }
    )
    r = ImageResizeStage(max_dim=256)(batch).to_pylist()[0]
    assert (r["width"], r["height"]) == (100, 50)
    assert np.array_equal(ppm_decode(r["payload"]), px)  # no-op under max_dim


def test_image_stats_exact():
    px = _img(16, 8, seed=4)
    batch = pa.table(
        {
            "doc_id": pa.array([10], type=pa.int64()),
            "media_ref": ["s.bmp"],
            "payload": pa.array([bmp_encode(px)], type=pa.binary()),
        }
    )
    r = ImageStatsFeatures()(batch).to_pylist()[0]
    assert r["doc_id"] == 10  # dtype passes through (no string cast)
    assert (r["width"], r["height"], r["n_px"]) == (16, 8, 16 * 8 * 3)
    assert r["px_sum"] == int(px.astype(np.int64).sum())
    assert r["px_min"] == int(px.min()) and r["px_max"] == int(px.max())


def test_audio_features_exact():
    s = ((np.arange(160) * 3) % 2001 - 1000).astype(np.int16)
    batch = pa.table(
        {
            "doc_id": pa.array([7, 8], type=pa.int64()),
            "media_ref": ["a.wav", "bad"],
            "payload": pa.array([wav_encode(s, 8000), b"junk"],
                                type=pa.binary()),
        }
    )
    rows = {r["media_ref"]: r for r in AudioFeatureStage()(batch).to_pylist()}
    ok = rows["a.wav"]
    s64 = s.astype(np.int64)
    assert ok["framerate"] == 8000 and ok["n_channels"] == 1
    assert ok["n_frames"] == 160 and ok["duration_ms"] == 160 * 1000 // 8000
    assert ok["peak_abs"] == int(np.abs(s64).max())
    assert ok["sum_samples"] == int(s64.sum())
    assert ok["sum_sq"] == int((s64 * s64).sum())
    assert rows["bad"]["error"] and rows["bad"]["n_frames"] == 0


def test_frame_sampling_expands_rows():
    out = FrameSampleStage(every_k=10)(_media_batch())
    rows = [r for r in out.to_pylist() if r["media_ref"] == "b.vid"]
    assert [r["frame_idx"] for r in rows] == [0, 10, 20]
    # frames are REAL BMPs — decode one
    assert bmp_decode(rows[1]["frame"]).shape == (4, 8, 3)
    errs = [r for r in out.to_pylist() if r["error"]]
    assert {r["media_ref"] for r in errs} == {"a.bmp", "broken"}


def test_byte_histogram_features():
    out = ByteHistogramFeatures()(_media_batch())
    rows = {r["media_ref"]: r for r in out.to_pylist()}
    v = np.array(rows["a.bmp"]["embedding"])
    assert v.shape == (256,)
    assert abs(v.sum() - 1.0) < 1e-5
    assert v.min() >= 0


def test_media_stage_pipeline(ray_session):
    """End-to-end actor-pool plumbing: resize → image stats, real BMPs."""
    import ray.data

    ds = ray.data.from_arrow(_media_batch())
    out = (
        ds.map_batches(ImageResizeStage, batch_format="pyarrow",
                       concurrency=(1, 2), batch_size=2)
        .filter(expr="error == ''")
        .map_batches(ImageStatsFeatures, batch_format="pyarrow",
                     concurrency=(1, 2), batch_size=2)
    ).take_all()
    assert len(out) == 1 and out[0]["media_ref"] == "a.bmp"
    assert out[0]["n_px"] == 256 * 128 * 3  # class default max_dim=256


def test_select_article_images_rule():
    from smartreader_ray.stages.media import select_article_images

    pairs = [("a", 75_000), ("b", 75_001), ("c", 200_000), ("", 999_999)]
    kept, featured = select_article_images(pairs)
    # strictly greater than min_size (Article.cs:200 `size > minSize`),
    # empty src skipped, document order preserved, first keeper featured
    assert kept == [("b", 75_001), ("c", 200_000)]
    assert featured == "b"
    # metadata-set featured image wins over the fallback
    _, still = select_article_images(pairs, featured="meta.png")
    assert still == "meta.png"
    assert select_article_images([("a", 10)]) == ([], "")


def test_audio_spectral_recovers_planted_tone():
    from smartreader_ray.stages.media import AudioSpectralFeatures

    frame, hop = 256, 128
    t = np.arange(1024 + 3 * hop)
    tone = (8000.0 * np.sin(2 * np.pi * 20 * t / frame)).astype(np.int16)
    silence = np.zeros(1024, dtype=np.int16)
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
            "media_ref": ["tone", "silence", "junk", "short"],
            "payload": pa.array(
                [wav_encode(tone, 8000), wav_encode(silence, 8000),
                 b"nope", wav_encode(np.zeros(10, dtype=np.int16), 8000)],
                type=pa.binary(),
            ),
        }
    )
    rows = {r["media_ref"]: r
            for r in AudioSpectralFeatures(frame, hop)(batch).to_pylist()}
    ok = rows["tone"]
    assert ok["dominant_bin"] == 20  # bin-aligned tone recovered exactly
    assert ok["n_frames"] == 1 + (len(tone) - frame) // hop
    assert len(ok["embedding"]) == 16
    # the tone's energy concentrates in its band: bin 20 of 129 -> band 2
    emb = np.array(ok["embedding"])
    assert emb.argmax() == 2
    assert rows["silence"]["dominant_bin"] == 0  # flat spectrum, argmax=0
    assert rows["junk"]["error"] and rows["junk"]["dominant_bin"] == -1
    assert "shorter than one analysis frame" in rows["short"]["error"]


def test_audio_spectral_stereo_channel0():
    from smartreader_ray.stages.media import AudioSpectralFeatures

    frame = 256
    t = np.arange(1024)
    left = (8000.0 * np.sin(2 * np.pi * 12 * t / frame)).astype(np.int16)
    right = (8000.0 * np.sin(2 * np.pi * 40 * t / frame)).astype(np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1)
    batch = pa.table(
        {
            "doc_id": pa.array([1], type=pa.int64()),
            "media_ref": ["st"],
            "payload": pa.array([wav_encode(inter, 8000, n_channels=2)],
                                type=pa.binary()),
        }
    )
    r = AudioSpectralFeatures(frame, 128)(batch).to_pylist()[0]
    assert r["dominant_bin"] == 12  # channel 0, not the mix


def test_audio_autocorr_bruteforce_and_edges():
    from smartreader_ray.stages.media import AudioAutocorrFeatures

    rng = np.random.default_rng(9)
    s = rng.integers(-32000, 32000, size=300).astype(np.int16)
    short = np.array([5, -7, 11], dtype=np.int16)  # len 3 < lag 4
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "media_ref": ["a", "b", "junk"],
        "payload": pa.array(
            [wav_encode(s, 8000), wav_encode(short, 8000), b"nope"],
            type=pa.binary()),
    })
    rows = {r["media_ref"]: r
            for r in AudioAutocorrFeatures((1, 2, 4))(batch).to_pylist()}
    a = rows["a"]
    s64 = s.astype(np.int64)
    assert a["n_frames"] == 300 and a["error"] == ""
    assert a["ac_0"] == int((s64 * s64).sum())
    for L in (1, 2, 4):
        assert a[f"ac_{L}"] == int((s64[:-L] * s64[L:]).sum())
    b = rows["b"]
    assert b["ac_4"] == 0  # lag beyond clip length
    assert b["ac_1"] == 5 * -7 + -7 * 11
    assert rows["junk"]["error"] != "" and rows["junk"]["ac_0"] == 0


def test_audio_autocorr_stereo_channel0():
    from smartreader_ray.stages.media import AudioAutocorrFeatures

    left = np.array([1, 2, 3, 4], dtype=np.int16)
    right = np.array([100, 100, 100, 100], dtype=np.int16)
    inter = np.stack([left, right], axis=1).reshape(-1)
    batch = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "media_ref": ["st"],
        "payload": pa.array([wav_encode(inter, 8000, n_channels=2)],
                            type=pa.binary()),
    })
    r = AudioAutocorrFeatures((1,))(batch).to_pylist()[0]
    assert r["n_frames"] == 4
    assert r["ac_0"] == 1 + 4 + 9 + 16
    assert r["ac_1"] == 1 * 2 + 2 * 3 + 3 * 4


def test_audio_autocorr_bad_lags():
    import pytest
    from smartreader_ray.stages.media import AudioAutocorrFeatures

    with pytest.raises(ValueError):
        AudioAutocorrFeatures(())
    with pytest.raises(ValueError):
        AudioAutocorrFeatures((0,))
