"""Multimodal binary plumbing: metadata extraction is real (sha256 /
length / magic), feature extraction and frame sampling exercise the
Arrow-batch dataflow with the documented deterministic fake decode;
the honest decode stub raises NotImplementedError."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    extract_meta,
    frame_sample,
    synth_media,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text"
    ).limit(60)
    return synth_media(docs).cache()


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


def test_feature_extraction_shape_and_determinism(spark, media):
    feats = extract_features(media).collect()
    assert len(feats) == 60
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    for r in feats:
        assert again[r["media_id"]] == r["feature"]  # deterministic


def test_frame_sampling(spark, media):
    frames = frame_sample(media, every_n_bytes=32, max_frames=5)
    rows = frames.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in per_doc.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense 0..n-1
        assert len(idxs) <= 5


def test_decode_stub_is_honest():
    with pytest.raises(NotImplementedError):
        decode_media(b"xxx", "img")
