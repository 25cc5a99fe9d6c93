"""Plan audits (SURVEY §4): the physical properties the 100 TB design
depends on must hold and stay held — filter pushdown to parquet,
column pruning, broadcast of the query side, bounded shuffle counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.plans.audit import (
    audit,
    count_shuffles,
    has_broadcast_join,
    pushed_filters,
    read_schemas,
)

SF = "/root/testdata/sf0.01"


def test_filter_pushdown_and_pruning(spark):
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_shipdate") <= "1996-01-01")
        .select("l_orderkey", "l_quantity")
    )
    a = audit(df)
    assert any("l_shipdate" in f for f in a["pushed_filters"]), a
    # column pruning: scan must read only the 3 needed columns
    assert all(
        "l_extendedprice" not in s and "l_comment" not in s
        for s in a["read_schemas"]
    ), a


def test_bm25_query_side_is_broadcast(spark):
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api

    df = api.q_bm25_topk(spark, SF)
    assert has_broadcast_join(df)


def test_segment_query_plan(spark, corpus_df, tmp_path):
    """Segment top-k (collect-free path): bucket partitions prune
    DYNAMICALLY from the broadcast query-term side (no driver-side
    term collect); the query side broadcasts; shuffle count stays
    bounded (decode spread + score agg + window — no accidental extra
    exchanges). The driver-known-terms path (blocks_for_terms) keeps
    static parquet predicate pushdown — asserted separately."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
        with_doc_id,
    )
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
        SegmentIndex,
        build_segment_index,
        segment_topk,
    )

    d = str(tmp_path / "planidx")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    idx = SegmentIndex.open(spark, d)
    q = spark.createDataFrame(
        [("q0", "tok0001 tok0002 uniq00003doc")], "query_id string, text string"
    )
    df = segment_topk(idx, q, k=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "bucket partition pruning must be planned dynamically from the "
        "broadcast term side"
    )
    assert has_broadcast_join(df)
    # heavy-side: decode-spread repartition + score groupBy + rank
    # window; plus up to 2 KB-sized dim-side exchanges (query-term
    # distinct feeding the DPP broadcast) — bounded, not data-scaled
    assert count_shuffles(df) <= 5, count_shuffles(df)
    # static path: term predicate reaches the parquet scan
    blocks = idx.blocks_for_terms(["tok0001", "tok0002"])
    assert any("term" in f for f in pushed_filters(blocks)), (
        pushed_filters(blocks)
    )


def test_doc_len_is_narrow(spark):
    """doc_len is a per-doc constant — it must come off the corpus
    scan narrow, never via a groupBy over the postings (round-1
    verdict #5: a full index shuffle at 100×)."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api

    assert count_shuffles(api.q_doc_len(spark, SF)) == 0


def test_narrow_ops_have_no_shuffle(spark):
    """Text-analysis operators must be pure projections."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.text import (
        with_fingerprint,
        with_lang_id,
        with_quality,
        with_token_counts,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    for op in (with_lang_id, with_quality, with_fingerprint,
               with_token_counts):
        assert count_shuffles(op(docs)) == 0, op.__name__


def test_local_peaks_single_exchange(spark):
    """local_peaks uses two frame-bounded window maxima over the SAME
    (partition, order) spec — they must share one sort: exactly one
    shuffle Exchange in the plan, no self-join, no extra sort."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api

    df = api.q_local_peaks(spark, SF)
    assert count_shuffles(df) == 1, audit(df)


def test_wand_batched_plan(spark, corpus_df, tmp_path):
    """Batched WAND: the per-(group, term) query map joins the block
    side as a BROADCAST (blocks never replicate per query), and the
    only shuffles are the block spread + the repartition by group —
    the shape whose payload volume scales with groups, not batch
    size."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
        with_doc_id,
    )
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
        SegmentIndex,
        build_segment_index,
    )
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.wand import (
        wand_topk,
    )

    d = str(tmp_path / "wandplan")
    build_segment_index(spark, with_doc_id(corpus_df), d, n_buckets=4,
                        hot_df=8, block_size=16)
    idx = SegmentIndex.open(spark, d)
    qs = spark.createDataFrame(
        [("q1", "vector scan filter"), ("q2", "scan batch stream")],
        "query_id string, text string",
    )
    df = wand_topk(idx, qs, k=3)
    a = audit(df)
    assert a["broadcast_join"], a
    # bounded: query tokenize/explode + tiny (grp,term) agg + block
    # spread + repartition-by-group; NOT one exchange per query
    assert a["shuffles"] <= 4, a


def test_ivf_assign_is_narrow(spark):
    """Cell assignment must be a per-row argmax over centroid
    literals — zero shuffle of the vector table (the docstring's
    'runs once at ingest, narrow' claim, made assertable)."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.similarity import (
        _as_double,
        _norm,
        ivf_assign,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cent = ivf_centroids(emb)
    base = emb.select(
        F.col("vec_id"), _as_double(F.col("embedding")).alias("v")
    ).withColumn("vnorm", _norm(F.col("v")))
    assert count_shuffles(ivf_assign(base, cent)) == 0


def test_search_verified_gates_verify_on_topk(spark):
    """The two-phase plan must semi-join verification postings to the
    (broadcast) top-k doc set BEFORE the position explode — verify
    cost follows k, not candidate count."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api
    from shazam_an_industrial_strength_audio_search_algorithm__spark.plans.audit import (
        plan_string,
    )

    df = api.q_search_verified(spark, SF)
    plan = plan_string(df)
    assert "LeftSemi" in plan, "candidate gating lost"
    assert has_broadcast_join(df)


def test_search_verified_segment_gates_verify_on_topk(spark):
    """The persisted two-phase plan (WAND coarse top-k → varint
    positional verify) must keep the same gating shape: decoded
    occurrences semi-join the broadcast top-k doc set before the
    verify join, so verify cost follows k on the segment path too."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api
    from shazam_an_industrial_strength_audio_search_algorithm__spark.plans.audit import (
        plan_string,
    )

    df = api.q_search_verified_segment(spark, SF)
    plan = plan_string(df)
    assert "LeftSemi" in plan, "candidate gating lost"
    assert has_broadcast_join(df)


def test_positional_segment_decode_is_flat(spark):
    """The persisted positional path must carry positions as a flat
    long column out of the decode kernel (no Generate/explode over an
    array column after mapInPandas)."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.positional import (
        query_term_positions,
    )

    idx = api.docs_segment_index(spark, SF)
    qtp = query_term_positions(api.queries_df(spark))
    decoded = idx.positions_for_query_terms(qtp)
    assert "pos" in decoded.columns and "positions" not in decoded.columns
    # no explode between decode and aggregation in the full query
    from shazam_an_industrial_strength_audio_search_algorithm__spark.plans.audit import (
        plan_string,
    )

    plan = plan_string(api.q_positional_segment(spark, SF))
    # the query-side posexplode is fine (tiny); a doc-side explode of
    # a positions ARRAY column would mean the flat-decode path was lost
    assert "explode(positions" not in plan


def test_emb_neardup_blocked_has_no_pair_explosion(spark):
    """The battery's emb_neardup plan must be the blocked executor:
    no non-equi pair join (the brute plan's BroadcastNestedLoopJoin /
    CartesianProduct over O(n²) pairs) — candidates come out of the
    block-grid groupBy, and the exact re-score attaches vectors via
    equi-joins only."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api
    from shazam_an_industrial_strength_audio_search_algorithm__spark.plans.audit import (
        plan_string,
    )

    df = api.q_emb_neardup(spark, SF)
    plan = plan_string(df)
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # grid groupBy = one exchange; two re-score equi-joins may add at
    # most one exchange each (AQE may instead broadcast them)
    assert count_shuffles(df) <= 5, audit(df)


def test_match_stats_dist_has_no_unpartitioned_window(spark):
    """The distributed report path (`q_match_stats_dist`) must not
    contain a single-partition global Window — the total order comes
    from the range-shuffle + offset-cumsum `global_rank` operator
    (MapInPandas local ranks). Every Window node in the plan must
    carry a non-empty partition spec."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api
    from shazam_an_industrial_strength_audio_search_algorithm__spark.plans.audit import (
        plan_string,
    )

    def unpartitioned_windows(plan: str) -> int:
        # a Window node's Arguments line is [functions], [partition
        # spec], [order spec] — the partition list is OMITTED entirely
        # when empty, so an unpartitioned window has ONE "], ["
        # separator and a partitioned one has two
        return sum(
            line.count("], [") == 1
            for line in plan.splitlines()
            if "windowspecdefinition" in line and "Arguments:" in line
        )

    plan = plan_string(api.q_match_stats_dist(spark, SF))
    assert "MapInPandas" in plan
    assert unpartitioned_windows(plan) == 0, plan
    # the single-partition form, by contrast, HAS one (the report
    # window) — pins that the detector detects what it guards
    base = plan_string(api.q_match_stats(spark, SF))
    assert unpartitioned_windows(base) == 1, base


def test_composed_queries_release_tracked_caches(spark):
    """Cache hygiene (round-4): the composed two-phase queries persist
    their top-k intermediate (it feeds two consumers of a LAZY result,
    so it must outlive the fn) — but the cache is TRACKED: at most one
    generation is live, the next composed query releases the previous
    one, and release_caches() empties the set entirely."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api

    jsc = spark.sparkContext._jsc  # noqa: SLF001
    # warm-up: first call constructs the per-sf_dir index caches
    # (deliberately long-lived, _INDEX_CACHE/_SEG_CACHE) — measure the
    # tracked-persist churn AFTER that steady state is reached
    api.q_search_verified(spark, SF).collect()
    api.q_search_verified_segment(spark, SF).collect()
    api.release_caches()
    n0 = jsc.getPersistentRDDs().size()
    api.q_search_verified(spark, SF).collect()
    n1 = jsc.getPersistentRDDs().size()
    assert n1 <= n0 + 1
    # the next composed query releases the previous generation first
    api.q_search_verified_segment(spark, SF).collect()
    assert jsc.getPersistentRDDs().size() <= n0 + 1
    api.release_caches()
    assert jsc.getPersistentRDDs().size() <= n0
    # temp layout dirs are registered for exit-time removal
    assert any("driver_segidx_" in d for d in api._TMP_DIRS)


def test_bool_query_prefix_pushdown(spark):
    """The boolean prefix clause must reach the parquet scan as a
    pushed StartsWith — the term-dictionary range scan's whole value
    at 100 TB is row-group pruning on the term-clustered blocks."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark import api

    idx = api.docs_segment_index(spark, SF)
    df = idx.blocks_for_term_prefixes(["tok001", "uniq"])
    pf = pushed_filters(df)
    assert any("StartsWith(term" in f for f in pf), pf

    # and the full bool_query plan broadcasts the tiny spec sides
    assert has_broadcast_join(api.q_bool_query(spark, SF))
