"""Snapshot GC: vacuum removes unreferenced generations and expired
snapshots while every kept snapshot stays fully queryable."""

from __future__ import annotations

import os

import pytest

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.maintenance import (
    apply_updates,
    restore,
    snapshot_log,
    vacuum,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
    build_segment_index,
    segment_topk,
)


def test_vacuum_keeps_current_queryable(spark, corpus_pdf, update_fixtures, tmp_path):
    d = str(tmp_path / "vacidx")
    corpus = with_doc_id(spark.createDataFrame(corpus_pdf))
    build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8, block_size=16)
    add_pdf, del_pdf = update_fixtures
    apply_updates(spark, d, add_corpus=spark.createDataFrame(add_pdf))   # v2
    apply_updates(spark, d, delete_keys=spark.createDataFrame(del_pdf))  # v3

    before = segment_topk(
        SegmentIndex.open(spark, d),
        spark.createDataFrame([("q", "uniq00010doc")], "query_id string, text string"),
        k=3,
    ).collect()

    report = vacuum(d, keep_last=2)
    assert 3 in report["kept_versions"]
    assert 1 in report["removed_versions"]
    assert [s["version"] for s in snapshot_log(d)] == [2, 3]

    # current snapshot still answers identically
    after = segment_topk(
        SegmentIndex.open(spark, d),
        spark.createDataFrame([("q", "uniq00010doc")], "query_id string, text string"),
        k=3,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in before] == [
        (r["doc_id"], r["score"]) for r in after
    ]

    # kept older snapshot (v2) also still opens and queries
    restore(d, 2)
    assert SegmentIndex.open(spark, d).version == 2
    assert segment_topk(
        SegmentIndex.open(spark, d),
        spark.createDataFrame([("q", "rewritten0mark")], "query_id string, text string"),
        k=1,
    ).count() == 1
    restore(d, 3)

    # expired snapshot must be gone
    with pytest.raises(FileNotFoundError):
        restore(d, 1)
    assert not os.path.exists(f"{d}/snapshots/v1.json")