"""Snapshot-store durability invariants: version allocation after
restore, idempotent build re-runs, fresh rebuilds over stale dirs,
vacuum vs in-flight generations, and degenerate (all-empty) update
batches. Each test pins one failure mode found by review."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.maintenance import (
    apply_updates,
    restore,
    vacuum,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
    _read_current,
    build_segment_index,
    drop_index,
    segment_topk,
)


def _mini_corpus(spark, rows):
    return with_doc_id(spark.createDataFrame(pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    )))


def _add_batch(spark, tag, n=3, content=None):
    rows = [
        (f"r{tag}", f"p{tag}/{i}", f"c{tag}{i:038d}", "py",
         content if content is not None else f"added{tag}tok{i} shared{tag}")
        for i in range(n)
    ]
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lang", "content"]
    ))


def _topk_rows(spark, d, text, version=None):
    idx = SegmentIndex.open(spark, d, version=version)
    qs = spark.createDataFrame(pd.DataFrame(
        [("q0", text)], columns=["query_id", "text"]
    ))
    return [
        (r["rank"], r["doc_id"], r["score"])
        for r in segment_topk(idx, qs, k=5).orderBy("rank").collect()
    ]


def test_restore_then_update_never_clobbers_forward_snapshots(
        spark, corpus_df, tmp_path):
    d = str(tmp_path / "idx")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    apply_updates(spark, d, add_corpus=_add_batch(spark, "a"), mode="delta")
    r3 = apply_updates(spark, d, add_corpus=_add_batch(spark, "b"),
                       mode="delta")
    assert r3.snapshot_version == 3
    want_v3 = _topk_rows(spark, d, "addedbtok1 sharedb", version=3)
    assert want_v3, "v3 must see batch b"

    restore(d, 1)
    r_new = apply_updates(spark, d, add_corpus=_add_batch(spark, "c"),
                          mode="delta")
    # fresh version ABOVE the retained v3, never a reused 2
    assert r_new.snapshot_version == 4
    # v3 history must be bit-identical after the post-restore update
    assert _topk_rows(spark, d, "addedbtok1 sharedb", version=3) == want_v3
    # and the new lineage branches from v1: no batch-a docs in v4
    assert _topk_rows(spark, d, "addedatok1 shareda") == []
    drop_index(d)


def test_rerun_resume_build_keeps_current_pointer(spark, corpus_df, tmp_path):
    d = str(tmp_path / "idx")
    corpus = with_doc_id(corpus_df)
    build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                        block_size=16)
    apply_updates(spark, d, add_corpus=_add_batch(spark, "a"), mode="delta")
    assert _read_current(d) == 2
    # idempotent pipeline retry of the build step
    rep = build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                              block_size=16, resume=True)
    assert rep.phase_a_skipped and rep.built_buckets == []
    assert _read_current(d) == 2, "resume re-run must not roll CURRENT back"
    assert _topk_rows(spark, d, "addedatok1 shareda"), "update still visible"
    drop_index(d)


def test_fresh_rebuild_is_atomic_generation_swap(spark, corpus_df,
                                                 tmp_path):
    """Rebuild-over-live since round 4: a fresh build over a committed
    index stages a NEW generation and commits snapshot+CURRENT — no
    stale buckets leak into the new snapshot, AND the old snapshot
    stays serveable throughout (version pinning)."""
    d = str(tmp_path / "idx")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    old_term = corpus_df.select(
        F.explode(F.split("content", " ")).alias("t")).first()["t"]
    assert SegmentIndex.open(spark, d).postings_for_terms(
        [old_term]).count() > 0
    # old corpus has terms in every bucket; the new corpus is one doc
    # with one term -> 3 of 4 buckets must come back EMPTY in v2
    tiny = _mini_corpus(spark, [("r", "p", "c" * 40, "py", "lonetoken")])
    rep = build_segment_index(spark, tiny, d, n_buckets=4, hot_df=8,
                              block_size=16)
    assert rep.snapshot_version == 2 and _read_current(d) == 2
    snap = json.load(open(f"{d}/snapshots/v2.json"))
    assert snap["operation"] == "rebuild" and snap["parent"] == 1
    gen = snap["gen"]
    manifests = [
        json.load(open(f"{d}/manifests/{gen}/bucket_{b}.json"))
        for b in range(4)
    ]
    assert sum(m["n_terms"] for m in manifests) == 1, (
        "stale buckets from the previous corpus survived the rebuild"
    )
    idx = SegmentIndex.open(spark, d)
    assert idx.n_docs == 1
    # a term that only existed in the OLD corpus must be gone from v2
    assert idx.postings_for_terms([old_term]).count() == 0
    # ... but v1 still serves the OLD corpus bit-identically
    v1 = SegmentIndex.open(spark, d, version=1)
    assert v1.postings_for_terms([old_term]).count() > 0
    drop_index(d)


def test_crash_mid_rebuild_leaves_old_snapshot_serving(spark, corpus_df,
                                                       tmp_path):
    """Kill-mid-rebuild: interrupt the rebuild after 2 of 4 buckets —
    CURRENT must still point at v1 and v1 must answer queries exactly
    as before; resuming the rebuild then commits v2 with the new
    corpus. (The round-3 verdict's non-atomic window, closed.)"""
    d = str(tmp_path / "idx")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    probe = corpus_df.select(
        F.explode(F.split("content", " ")).alias("t")).first()["t"]
    before = _topk_rows(spark, d, probe)
    assert before

    new_corpus = _mini_corpus(spark, [
        ("r2", f"p{i}", "c" * 40, "py", f"rebuilt{i} freshtoken")
        for i in range(5)
    ])
    # interrupted rebuild: only 2 of 4 buckets complete, then "crash"
    r1 = build_segment_index(spark, new_corpus, d, n_buckets=4, hot_df=8,
                             block_size=16, buckets=[0, 1])
    assert r1.snapshot_version is None, "incomplete rebuild must not commit"
    assert _read_current(d) == 1, "crash mid-rebuild moved CURRENT"
    assert _topk_rows(spark, d, probe) == before, (
        "old snapshot no longer serves identically mid-rebuild"
    )

    # resume completes the SAME staged generation and commits v2
    r2 = build_segment_index(spark, new_corpus, d, n_buckets=4, hot_df=8,
                             block_size=16, resume=True)
    assert sorted(r2.skipped_buckets) == [0, 1]
    assert sorted(r2.built_buckets) == [2, 3]
    assert r2.snapshot_version == 2 and _read_current(d) == 2
    assert _topk_rows(spark, d, "freshtoken")
    # history: v1 pinned-open still serves the old corpus
    assert _topk_rows(spark, d, probe, version=1) == before
    drop_index(d)


def test_vacuum_spares_inflight_generation(spark, corpus_df, tmp_path):
    d = str(tmp_path / "idx")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    apply_updates(spark, d, add_corpus=_add_batch(spark, "a"), mode="delta")
    apply_updates(spark, d, add_corpus=_add_batch(spark, "b"), mode="delta")
    # simulate a concurrent update caught between phase A and commit:
    # staging exists, no snapshot references gen u99 yet
    os.makedirs(f"{d}/manifests/u99")
    json.dump({"base_version": 3}, open(f"{d}/manifests/u99/params.json", "w"))
    os.makedirs(f"{d}/data/dt_u99/bucket=0")
    open(f"{d}/data/dt_u99/bucket=0/part-0.parquet", "wb").write(b"x")
    rep = vacuum(d, keep_last=1)
    assert os.path.exists(f"{d}/manifests/u99/params.json"), (
        "vacuum deleted an in-flight generation's manifests"
    )
    assert os.path.exists(f"{d}/data/dt_u99/bucket=0/part-0.parquet"), (
        "vacuum deleted an in-flight generation's staged data"
    )
    assert "dt_u99" not in rep["removed_data_dirs"]
    drop_index(d)


def test_update_batch_tokenizing_to_empty_completes(spark, corpus_df,
                                                    tmp_path):
    d = str(tmp_path / "idx")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    base_n = SegmentIndex.open(spark, d).n_docs
    # every doc tokenizes to nothing (punctuation/whitespace only)
    junk = _add_batch(spark, "z", n=2, content="!!! ??? \t \n ...")
    rep = apply_updates(spark, d, add_corpus=junk, mode="delta")
    assert rep.snapshot_version == 2, "degenerate batch must still commit"
    idx = SegmentIndex.open(spark, d)
    assert idx.n_docs == base_n, "empty docs must not count toward N"
    # index still answers queries
    term = corpus_df.select(
        F.explode(F.split("content", " ")).alias("t")).first()["t"]
    assert idx.postings_for_terms([term]).count() > 0
    drop_index(d)
