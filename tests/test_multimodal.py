"""Multimodal binary plumbing + REAL decode: metadata extraction is
real (sha256 / length / magic); WAV (RIFF PCM16) and PPM (P6) parse
for real with pure numpy; corrupt payloads quarantine instead of
crashing (↔ ``Matching.py:113-117``); only recognized compressed
formats keep the honest NotImplementedError stub."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.multimodal import (
    FEATURE_DIM,
    WAV_HI_RATE,
    _decode_wav,
    decode_media,
    decode_stats,
    extract_features,
    extract_meta,
    frame_sample,
    synth_media,
    synth_ppm_bytes,
    synth_real_media,
    synth_wav_bytes,
)

SF = "/root/testdata/sf0.001"


def _want_wav(mid: int) -> np.ndarray:
    """Expected NORMALIZED value stream for synth_real_media's wav
    flavors (mirrors the DuckDB oracle in api.Q_MEDIA_DECODE_SQL)."""
    n = 200 + mid % 57
    i = np.arange(n, dtype=np.int64)
    if mid % 9 == 3:  # stereo @8k → mono mean-mix (floor)
        a0 = (mid * 31 + i * 17 + 7) % 65536 - 32768
        a1 = (mid * 31 + i * 17 + 11 + 7) % 65536 - 32768
        return (a0 + a1) // 2
    if mid % 9 == 6:  # mono @16k, 2n frames → 2:1 block-mean (floor)
        j = np.arange(2 * n, dtype=np.int64)
        s = (mid * 31 + j * 17 + 7) % 65536 - 32768
        return (s[0::2] + s[1::2]) // 2
    return (mid * 31 + i * 17 + 7) % 65536 - 32768


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(60)
    return synth_media(docs).cache()


@pytest.fixture(scope="module")
def real_media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(90)
    return synth_real_media(docs).cache()


def test_meta_is_real(spark, media):
    rows = extract_meta(media).collect()
    assert len(rows) == 60
    by_id = {r["media_id"]: r for r in rows}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for mid, payload in src.items():
        m = by_id[mid]
        assert m["n_bytes"] == len(payload)
        assert m["payload_sha"] == hashlib.sha256(payload).hexdigest()
        assert m["magic"] in ("img0", "aud0", "vid0")
        assert m["magic"][:3] == m["kind"]


# ---------------------------------------------------------------------------
# real WAV / PPM parsers
# ---------------------------------------------------------------------------
def test_wav_roundtrip_decodes_exact_samples():
    for doc_id in (0, 3, 42, 333):
        payload = synth_wav_bytes(doc_id)
        values, meta = decode_media(payload)
        assert meta["fmt"] == "wav"
        assert meta["sample_rate"] == 8000
        assert meta["channels"] == 1 and meta["bits"] == 16
        n = 200 + doc_id % 57
        i = np.arange(n, dtype=np.int64)
        want = (doc_id * 31 + i * 17 + 7) % 65536 - 32768
        assert values.shape == (n,)
        assert (values == want).all()


def test_ppm_roundtrip_decodes_exact_raster():
    for doc_id in (1, 4, 100, 499):
        payload = synth_ppm_bytes(doc_id)
        values, meta = decode_media(payload)
        assert meta["fmt"] == "ppm"
        w, h = 8 + doc_id % 9, 6 + doc_id % 7
        assert (meta["width"], meta["height"]) == (w, h)
        i = np.arange(w * h * 3, dtype=np.int64)
        assert (values == (doc_id * 7 + i * 13) % 256).all()


def test_ppm_header_comments_and_whitespace():
    """A P6 written by another tool: comment lines and spread-out
    whitespace in the header must parse identically."""
    base = synth_ppm_bytes(10)
    values0, meta0 = decode_media(base)
    raster = base.split(b"255\n", 1)[1]
    w, h = meta0["width"], meta0["height"]
    alt = (f"P6 # created elsewhere\n# {w}x{h} raster\n  {w}\t{h}\n"
           f"# maxval next\n255\n").encode() + raster
    values, meta = decode_media(alt)
    assert (values == values0).all()
    assert (meta["width"], meta["height"]) == (w, h)


@pytest.mark.parametrize(
    "payload",
    [
        b"RIFF\x00\x00",                       # truncated before WAVE
        synth_wav_bytes(0)[:9],                # the corrupt fixture
        synth_wav_bytes(0)[:-1],               # data chunk short 1 byte
        b"RIFF" + (4).to_bytes(4, "little") + b"WAVE",  # no chunks
        b"P6\n8",                              # truncated ppm header
        synth_ppm_bytes(1)[:-1],               # raster short 1 byte
        b"P6\n8 6\n70000\n" + b"\x00" * 144,   # maxval out of range
        b"total garbage",
    ],
)
def test_corrupt_payloads_raise_valueerror(payload):
    with pytest.raises(ValueError):
        decode_media(payload)


def test_decode_stub_is_honest_for_compressed_only():
    """mp3/jpeg/png/bin: recognized, not decodable here — the stub
    survives EXACTLY where a codec library is genuinely required."""
    for payload in (b"ID3\x04rest", b"\xff\xd8\xff\xe0jfif",
                    b"\x89PNG\r\n\x1a\nrest", b"BIN0opaque"):
        with pytest.raises(NotImplementedError):
            decode_media(payload)


def test_wav_multichannel_and_word_alignment():
    """Stereo PCM16 with an odd-sized LIST chunk before data: the raw
    chunk walker must word-align and the frame check must accept
    whole stereo frames (raw parse, pre-normalization)."""
    samples = np.arange(-6, 6, dtype="<i2")  # 6 stereo frames
    data = samples.tobytes()
    chunks = (
        b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # pad byte
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (176400).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little") + data
    )
    payload = b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks
    values, meta = _decode_wav(payload)
    assert meta["channels"] == 2 and meta["sample_rate"] == 44100
    assert (values == np.arange(-6, 6)).all()


# ---------------------------------------------------------------------------
# channel/rate normalization (↔ reference read_audio,
# _helper_basics_.py:102-108: mono-mix + resample to target rate)
# ---------------------------------------------------------------------------
def test_wav_stereo_mean_mix():
    for doc_id in (3, 12, 39):
        values, meta = decode_media(synth_wav_bytes(doc_id, channels=2))
        assert meta["src_channels"] == 2 and meta["channels"] == 1
        assert meta["sample_rate"] == 8000
        assert (values == _want_wav(doc_id)).all()


def test_wav_integer_ratio_downsample():
    for doc_id in (6, 15, 42):
        n = 200 + doc_id % 57
        values, meta = decode_media(
            synth_wav_bytes(doc_id, sample_rate=WAV_HI_RATE,
                            n_frames=2 * n)
        )
        assert meta["src_sample_rate"] == WAV_HI_RATE
        assert meta["sample_rate"] == 8000
        assert values.shape == (n,)
        assert (values == _want_wav(doc_id)).all()


def test_wav_downsample_drops_partial_tail_block():
    values, _ = decode_media(
        synth_wav_bytes(0, sample_rate=WAV_HI_RATE, n_frames=5)
    )
    assert values.shape == (2,)  # 5 frames @2:1 → 2 full blocks


def test_wav_stereo_and_downsample_compose():
    n = 8
    values, meta = decode_media(
        synth_wav_bytes(7, channels=2, sample_rate=WAV_HI_RATE,
                        n_frames=2 * n)
    )
    j = np.arange(2 * n, dtype=np.int64)
    a0 = (7 * 31 + j * 17 + 7) % 65536 - 32768
    a1 = (7 * 31 + j * 17 + 11 + 7) % 65536 - 32768
    mixed = (a0 + a1) // 2
    want = (mixed[0::2] + mixed[1::2]) // 2
    assert meta["src_channels"] == 2 and meta["src_sample_rate"] == WAV_HI_RATE
    assert (values == want).all()


def test_wav_non_integer_ratio_is_unsupported():
    """44.1 kHz → 8 kHz is not an integer ratio, and 4 kHz → 8 kHz is
    upsampling: both genuinely need a DSP library → the unsupported
    quarantine (NotImplementedError), never a wrong answer."""
    for rate in (44100, 4000):
        with pytest.raises(NotImplementedError):
            decode_media(synth_wav_bytes(0, sample_rate=rate))


def test_wav_target_rate_override():
    values, meta = decode_media(
        synth_wav_bytes(0, sample_rate=WAV_HI_RATE, n_frames=10),
        target_rate=WAV_HI_RATE,
    )
    assert meta["sample_rate"] == WAV_HI_RATE
    assert values.shape == (10,)  # identity: no resample applied


# ---------------------------------------------------------------------------
# the Spark dataflow over real payloads
# ---------------------------------------------------------------------------
def test_decode_stats_statuses_and_values(spark, real_media):
    rows = {r["media_id"]: r for r in decode_stats(real_media).collect()}
    assert len(rows) == 90
    for mid, r in rows.items():
        corrupt = mid % 13 == 5 and mid % 3 != 2
        if corrupt:
            assert r["status"] == "corrupt" and r["fmt"] == "none"
            assert r["n_units"] == r["val_sum"] == -1
        elif mid % 3 == 2:
            assert r["status"] == "unsupported" and r["fmt"] == "none"
        elif mid % 3 == 0:
            assert r["status"] == "ok" and r["fmt"] == "wav"
            want = _want_wav(mid)  # flavor-aware: mono/stereo/16k
            assert r["n_units"] == 200 + mid % 57
            assert r["val_sum"] == int(want.sum())
            assert r["val_min"] == int(want.min())
            assert r["val_max"] == int(want.max())
        else:
            assert r["status"] == "ok" and r["fmt"] == "ppm"
            assert r["n_units"] == (8 + mid % 9) * (6 + mid % 7) * 3


def test_feature_extraction_real_fake_and_quarantine(spark, real_media):
    """WAV/PPM payloads → REAL features of the decoded samples;
    ``bin`` payloads → the deterministic fake; corrupt → NULL."""
    feats = {r["media_id"]: r["feature"]
             for r in extract_features(real_media).collect()}
    assert len(feats) == 90
    for mid, f in feats.items():
        corrupt = mid % 13 == 5 and mid % 3 != 2
        if corrupt:
            assert f is None
            continue
        assert len(f) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in f)
        if mid % 3 == 0:  # wav: check one real band value end-to-end
            want = _want_wav(mid)  # features see NORMALIZED samples
            chunk = np.array_split(want, FEATURE_DIM)[0]
            assert f[0] == pytest.approx(
                round(float(np.abs(chunk).mean()) / 32768.0, 6), abs=1e-9
            )
    again = {r["media_id"]: r["feature"]
             for r in extract_features(real_media).collect()}
    assert again == feats  # deterministic


def test_feature_extraction_shape_and_determinism(spark, media):
    """synth_media's text payloads are UNKNOWN bytes → NULL feature
    (quarantine), the honest behavior since real decode landed."""
    feats = extract_features(media).collect()
    assert len(feats) == 60
    assert all(r["feature"] is None for r in feats)


def test_frame_sampling(spark, media):
    frames = frame_sample(media, every_n_bytes=32, max_frames=5)
    rows = frames.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..n-1
        assert len(idxs) <= 5
