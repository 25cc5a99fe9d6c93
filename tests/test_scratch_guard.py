"""Scratch-budget guardrail for un-pruned brute top-k (round-5 item
8): the 4M campaign showed brute top-k dies with ENOSPC hours in
while WAND completes — the guard estimates the candidate
materialization (postings × queries-per-term) before running and
fails FAST, pointing at wand_topk."""

from __future__ import annotations

import pytest

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    EST_BYTES_PER_CANDIDATE_ROW,
    SegmentIndex,
    build_segment_index,
    estimate_brute_materialization,
    segment_topk,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
    query_terms,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.sources.corpus import (
    make_corpus,
    make_queries,
)


@pytest.fixture(scope="module")
def guarded(spark, tmp_path_factory):
    pdf = make_corpus(n_docs=60, seed=41, min_len=40, max_len=160)
    d = str(tmp_path_factory.mktemp("guardidx"))
    build_segment_index(
        spark, with_doc_id(spark.createDataFrame(pdf)), d,
        n_buckets=4, hot_df=16, block_size=16,
    )
    queries = spark.createDataFrame(
        make_queries(pdf, n_queries=6, seed=7)[["query_id", "text"]]
    ).cache()
    queries.count()
    return SegmentIndex.open(spark, d), queries


def test_estimate_counts_candidate_rows(spark, guarded):
    idx, queries = guarded
    qt = query_terms(queries, "query_id", "text")
    est = estimate_brute_materialization(idx, qt)
    assert est["rows"] > 0
    assert est["bytes"] == est["rows"] * EST_BYTES_PER_CANDIDATE_ROW
    # the estimate is exactly the candidate join's row count
    actual = idx.postings_for_query_terms(qt).join(qt, "term").count()
    assert est["rows"] == actual


def test_guard_fails_fast_on_low_budget(spark, guarded, monkeypatch):
    idx, queries = guarded
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_BUDGET_BYTES", "100")
    with pytest.raises(RuntimeError, match="wand_topk"):
        segment_topk(idx, queries, k=5)
    # explicit opt-out forces the brute path through
    assert segment_topk(idx, queries, k=5, scratch_check=False).count() > 0
    # disabling the budget also lets it run
    monkeypatch.setenv("SPARK_GRAFT_SCRATCH_BUDGET_BYTES", "none")
    assert segment_topk(idx, queries, k=5).count() > 0


def test_default_budget_admits_small_jobs(spark, guarded, monkeypatch):
    idx, queries = guarded
    monkeypatch.delenv("SPARK_GRAFT_SCRATCH_BUDGET_BYTES", raising=False)
    assert segment_topk(idx, queries, k=5).count() > 0
