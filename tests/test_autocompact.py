"""Data-aware layout policy + auto-compaction hook (round-5 items 2&3).

Contracts:

- ``auto_n_buckets`` / ``auto_block_size`` encode the measured
  round-4 serving law (per-bucket posting volume drives tuned WAND
  latency; BENCH/BASELINE.md §scale-stress round 4) as build-time
  defaults: 4M docs → 128 buckets, clamped to the well-tested small
  default below ~260k docs.
- ``build_segment_index`` with no layout knobs resolves them from the
  corpus size (one count job) and records them in the snapshot.
- ``compact(n_buckets=..., block_size=...)`` RE-SHARDS: results are
  identical to the original index under the new layout, and the
  corpus is never re-read.
- ``CompactionPolicy`` + ``maybe_compact`` keep a continuously
  upserting pipeline at peak WAND serving speed (layered snapshots
  serve exactly since round 5; compaction restores pruning sharpness
  and bounds the tombstone closure) and the policy-fired compactions
  are visible in the snapshot log with ``trigger="policy:..."``.
"""

from __future__ import annotations

import pandas as pd
import pytest

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.maintenance import (
    CompactionPolicy,
    apply_updates,
    compact,
    maybe_compact,
    should_compact,
    snapshot_log,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    MAX_BUCKETS,
    MIN_BUCKETS,
    SegmentIndex,
    auto_block_size,
    auto_n_buckets,
    build_segment_index,
    segment_topk,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.wand import (
    wand_topk,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.sources.corpus import (
    make_corpus,
    make_queries,
)

K = 5


def _topk_pdf(index, queries, k=K) -> pd.DataFrame:
    return (
        segment_topk(index, queries, k=k)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )


# ---------------------------------------------------------------------------
# policy units
# ---------------------------------------------------------------------------
def test_auto_n_buckets_reproduces_measured_optima():
    # the round-4 knob-study points
    assert auto_n_buckets(4_000_000) == 128
    assert auto_n_buckets(2_000_000) == 64
    assert auto_n_buckets(1_000_000) == 32
    # small corpora clamp to the well-tested default
    assert auto_n_buckets(20_000) == MIN_BUCKETS
    assert auto_n_buckets(0) == MIN_BUCKETS
    # monotone, power-of-two, upper clamp
    assert auto_n_buckets(16_000_000) == 512
    assert auto_n_buckets(10**12) == MAX_BUCKETS
    prev = 0
    for n in (10**4, 10**5, 10**6, 10**7, 10**8):
        cur = auto_n_buckets(n)
        assert cur >= prev and cur & (cur - 1) == 0
        prev = cur


def test_auto_block_size_crossover():
    assert auto_block_size(999_999) == 128
    assert auto_block_size(1_000_000) == 256


# ---------------------------------------------------------------------------
# auto knobs at build time
# ---------------------------------------------------------------------------
def test_build_defaults_are_data_aware(spark, tmp_path):
    pdf = make_corpus(n_docs=40, seed=3, min_len=30, max_len=120)
    d = str(tmp_path / "autoidx")
    build_segment_index(spark, with_doc_id(spark.createDataFrame(pdf)), d)
    idx = SegmentIndex.open(spark, d)
    assert idx.n_buckets == auto_n_buckets(40) == MIN_BUCKETS
    assert idx.snapshot["block_size"] == auto_block_size(40) == 128


# ---------------------------------------------------------------------------
# re-bucketing compaction
# ---------------------------------------------------------------------------
def test_compact_rebuckets_to_explicit_layout(spark, tmp_path):
    pdf = make_corpus(n_docs=60, seed=11, min_len=40, max_len=160)
    d = str(tmp_path / "rbidx")
    build_segment_index(
        spark, with_doc_id(spark.createDataFrame(pdf)), d,
        n_buckets=4, hot_df=8, block_size=16,
    )
    queries = spark.createDataFrame(
        make_queries(pdf, n_queries=6, seed=5)[["query_id", "text"]]
    )
    idx0 = SegmentIndex.open(spark, d)
    before = _topk_pdf(idx0, queries)

    report = compact(spark, d, n_buckets=8, block_size=32)
    assert report.snapshot_version is not None
    idx1 = SegmentIndex.open(spark, d)
    assert idx1.n_buckets == 8
    assert idx1.snapshot["block_size"] == 32
    assert idx1.snapshot["rebucketed"] is True
    assert not idx1.has_deltas
    after = _topk_pdf(idx1, queries)
    pd.testing.assert_frame_equal(before, after)
    # WAND serves the re-sharded snapshot and agrees with brute force
    wa = (
        wand_topk(idx1, queries, k=K).toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        before[["query_id", "rank", "doc_id"]],
        wa[["query_id", "rank", "doc_id"]],
    )


def test_compact_noop_without_layers_or_layout_change(spark, tmp_path):
    pdf = make_corpus(n_docs=30, seed=2, min_len=30, max_len=100)
    d = str(tmp_path / "noopidx")
    build_segment_index(
        spark, with_doc_id(spark.createDataFrame(pdf)), d,
        n_buckets=4, hot_df=8, block_size=16,
    )
    report = compact(spark, d, n_buckets=4, block_size=16)
    assert report.snapshot_version is None  # nothing to do


# ---------------------------------------------------------------------------
# the auto-compaction soak: continuous upserts, WAND always servable
# ---------------------------------------------------------------------------
def test_policy_soak_wand_always_servable(spark, tmp_path):
    pdf = make_corpus(n_docs=50, seed=21, min_len=40, max_len=160)
    d = str(tmp_path / "soakidx")
    build_segment_index(
        spark, with_doc_id(spark.createDataFrame(pdf.iloc[:30])), d,
        n_buckets=4, hot_df=8, block_size=16,
    )
    queries = spark.createDataFrame(
        make_queries(pdf, n_queries=4, seed=9)[["query_id", "text"]]
    )
    policy = CompactionPolicy(max_layers=1, rebucket=None)
    for i in range(4):
        batch = pdf.iloc[30 + 5 * i: 35 + 5 * i]
        apply_updates(
            spark, d,
            add_corpus=spark.createDataFrame(batch),
            mode="delta",
            auto_compact=policy,
        )
        idx = SegmentIndex.open(spark, d)
        # the hook compacted: layered state never reaches the reader
        assert not idx.has_deltas
        wand_topk(idx, queries, k=K).collect()  # must not raise
    log = snapshot_log(d)
    policy_compacts = [
        s for s in log
        if s.get("operation") == "compact"
        and str(s.get("trigger", "")).startswith("policy:")
    ]
    assert len(policy_compacts) == 4  # one per upsert at max_layers=1
    # final state serves every in-vocabulary query (q002 is the OOV
    # 'nil'-class fixture — zero rows is its correct answer)
    brute = _topk_pdf(SegmentIndex.open(spark, d), queries)
    assert set(brute["query_id"]) == {"q000", "q001", "q003"}


def test_policy_thresholds(spark, tmp_path):
    pdf = make_corpus(n_docs=40, seed=31, min_len=40, max_len=160)
    d = str(tmp_path / "polidx")
    build_segment_index(
        spark, with_doc_id(spark.createDataFrame(pdf.iloc[:30])), d,
        n_buckets=4, hot_df=8, block_size=16,
    )
    lazy = CompactionPolicy(max_layers=3, max_delta_frac=0.9, rebucket=None)
    # first delta: below both thresholds → no compaction
    apply_updates(
        spark, d, add_corpus=spark.createDataFrame(pdf.iloc[30:33]),
        mode="delta",
    )
    assert should_compact(spark, d, lazy) is None
    assert maybe_compact(spark, d, lazy) is None
    assert SegmentIndex.open(spark, d).has_deltas
    # pile on layers until the count threshold fires
    apply_updates(
        spark, d, add_corpus=spark.createDataFrame(pdf.iloc[33:36]),
        mode="delta",
    )
    apply_updates(
        spark, d, add_corpus=spark.createDataFrame(pdf.iloc[36:40]),
        mode="delta",
    )
    reason = should_compact(spark, d, lazy)
    assert reason is not None and "layers=3" in reason
    report = maybe_compact(spark, d, lazy)
    assert report is not None and report.snapshot_version is not None
    assert not SegmentIndex.open(spark, d).has_deltas
    # the delta-volume threshold alone also fires
    tight = CompactionPolicy(max_layers=99, max_delta_frac=0.0, rebucket=None)
    apply_updates(
        spark, d, add_corpus=spark.createDataFrame(
            pdf.iloc[:2].assign(content=["xx yy zz", "aa bb cc"])
        ),
        mode="delta",
    )
    reason = should_compact(spark, d, tight)
    assert reason is not None and "delta_postings" in reason
