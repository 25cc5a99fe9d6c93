"""Segment index: build → query equals the v1 DataFrame engine;
interrupted builds resume without recomputation; hot-term salting
produces ordered, disjoint blocks (SURVEY §5.3 resume test, §7.4)."""

from __future__ import annotations

import json
import math
import os

import pytest
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    InvertedIndex,
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
    build_segment_index,
    drop_index,
    segment_topk,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
    bm25_topk,
)

K = 10


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("segidx"))


@pytest.fixture(scope="module")
def built(spark, corpus_df, index_dir):
    corpus = with_doc_id(corpus_df)
    # hot_df tiny so the Zipf head actually gets salted at test scale
    report = build_segment_index(
        spark, corpus, index_dir, n_buckets=4, hot_df=8, block_size=16
    )
    return corpus, report


def test_build_commits_snapshot_and_manifests(built, index_dir):
    _, report = built
    assert sorted(report.built_buckets) == [0, 1, 2, 3]
    assert report.snapshot_version == 1
    assert open(f"{index_dir}/CURRENT").read().strip() == "1"
    for b in range(4):
        m = json.load(open(f"{index_dir}/manifests/init/bucket_{b}.json"))
        assert m["status"] == "committed"
        assert m["n_postings"] > 0


def test_segment_topk_equals_dataframe_engine(spark, built, index_dir, queries_df):
    corpus, _ = built
    seg = SegmentIndex.open(spark, index_dir)
    got = segment_topk(seg, queries_df, k=K).orderBy("query_id", "rank").collect()
    want = (
        bm25_topk(InvertedIndex.build(corpus), queries_df, k=K)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"], w["rank"], w["doc_id"],
        )
        assert math.isclose(g["score"], w["score"], rel_tol=1e-9)


def test_blocks_are_salted_ordered_disjoint(spark, built, index_dir):
    """Hot terms must fan out to >1 salt; within a term, blocks sorted
    by (salt, block_seq) must have non-overlapping ascending
    [doc_id_lo, doc_id_hi] ranges — the property WAND's sequential
    merge relies on."""
    segs = SegmentIndex.open(spark, index_dir).segments()
    hot = (
        segs.groupBy("term")
        .agg(
            F.countDistinct("salt").alias("n_salts"),
            F.sum("n_docs").alias("df"),
        )
        .filter(F.col("df") > 8 * 2)
        .collect()
    )
    assert any(r["n_salts"] > 1 for r in hot), "no hot term was salted"
    rows = segs.orderBy("term", "salt", "block_seq").collect()
    prev = {}
    for r in rows:
        key = r["term"]
        assert r["doc_id_lo"] <= r["doc_id_hi"]
        if key in prev:
            assert r["doc_id_lo"] > prev[key], (
                f"term {key}: block ranges overlap or out of order"
            )
        prev[key] = r["doc_id_hi"]
        # stored bounds are per-block maxima of the raw stats
        assert r["max_tf"] >= 1 and r["min_dl"] >= 1


def test_interrupted_build_resumes_without_recompute(spark, corpus_df, queries_df, tmp_path):
    """Kill after 2 of 4 buckets; resume must skip the committed ones
    and produce an index identical to the one-shot build."""
    corpus = with_doc_id(corpus_df)
    d = str(tmp_path / "resume_idx")
    r1 = build_segment_index(
        spark, corpus, d, n_buckets=4, hot_df=8, block_size=16, buckets=[0, 1]
    )
    assert r1.built_buckets == [0, 1]
    assert r1.snapshot_version is None  # not committed yet
    with pytest.raises(FileNotFoundError):
        SegmentIndex.open(spark, d)

    mtimes = {
        b: os.path.getmtime(f"{d}/manifests/init/bucket_{b}.json") for b in (0, 1)
    }
    r2 = build_segment_index(
        spark, corpus, d, n_buckets=4, hot_df=8, block_size=16, resume=True
    )
    assert r2.phase_a_skipped
    assert r2.skipped_buckets == [0, 1]
    assert r2.built_buckets == [2, 3]
    assert r2.snapshot_version == 1
    for b in (0, 1):  # committed buckets untouched
        assert os.path.getmtime(f"{d}/manifests/init/bucket_{b}.json") == mtimes[b]

    seg = SegmentIndex.open(spark, d)
    got = segment_topk(seg, queries_df, k=K).orderBy("query_id", "rank").collect()
    want = (
        bm25_topk(InvertedIndex.build(corpus), queries_df, k=K)
        .orderBy("query_id", "rank")
        .collect()
    )
    assert [(g["query_id"], g["rank"], g["doc_id"]) for g in got] == [
        (w["query_id"], w["rank"], w["doc_id"]) for w in want
    ]
    drop_index(d)


def test_resume_verify_inputs_rebuilds_tampered_bucket(spark, corpus_df, tmp_path):
    """Resume lineage check: manifests record an input_digest of each
    bucket's (term, df) multiset; ``verify_inputs=True`` recomputes it
    from the checkpointed doc_terms and rebuilds any bucket whose
    inputs no longer match — plain resume still trusts the manifest."""
    import json as _json

    from pyspark.sql import functions as F

    corpus = with_doc_id(corpus_df)
    d = str(tmp_path / "verify_idx")
    r1 = build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                             block_size=16)
    assert r1.snapshot_version == 1
    m0 = _json.load(open(f"{d}/manifests/init/bucket_0.json"))
    assert m0["input_digest"] != 0 and m0["term_min"] <= m0["term_max"]

    # tamper bucket 0's checkpointed doc_terms: drop one term's rows
    dt_dir = f"{d}/data/dt_init"
    dt0_pdf = spark.read.parquet(f"{dt_dir}/bucket=0").toPandas()
    victim = dt0_pdf["term"].iloc[0]
    spark.createDataFrame(
        dt0_pdf[dt0_pdf["term"] != victim]
    ).write.mode("overwrite").parquet(f"{dt_dir}/bucket=0")

    # plain resume: trusts manifests, skips everything
    r2 = build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                             block_size=16, resume=True)
    assert r2.skipped_buckets == [0, 1, 2, 3] and r2.built_buckets == []

    # verifying resume: bucket 0 fails its digest and rebuilds; the
    # others still skip
    r3 = build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                             block_size=16, resume=True, verify_inputs=True)
    assert r3.built_buckets == [0]
    assert r3.skipped_buckets == [1, 2, 3]
    # rebuilt manifest reflects the tampered (smaller) input
    m0b = _json.load(open(f"{d}/manifests/init/bucket_0.json"))
    assert m0b["input_digest"] != m0["input_digest"]
    assert m0b["n_terms"] == m0["n_terms"] - 1
    # a second verifying resume is now clean — everything skips
    r4 = build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                             block_size=16, resume=True, verify_inputs=True)
    assert r4.built_buckets == [] and r4.skipped_buckets == [0, 1, 2, 3]
    drop_index(d)


def test_bucket_pruning_reads_subset(spark, built, index_dir):
    """blocks_for_terms must touch only the buckets its terms hash to."""
    seg = SegmentIndex.open(spark, index_dir)
    one = seg.blocks_for_terms(["tok0000"])
    buckets = {r["bucket"] for r in one.select("bucket").distinct().collect()}
    assert len(buckets) == 1


def test_positions_roundtrip_through_segments(spark, corpus_df, tmp_path):
    """store_positions=True: per-doc occurrence offsets survive the
    varint block codec exactly (segment postings == v1 doc_terms),
    and the positional verifier gives identical answers on both
    paths. The same payloads still serve the positions-free BM25
    decode (trailing section skipped)."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.positional import (
        positional_verify,
        query_term_positions,
    )

    corpus = with_doc_id(corpus_df)
    d = str(tmp_path / "posidx")
    build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8,
                        block_size=16, store_positions=True)
    seg = SegmentIndex.open(spark, d)
    v1 = InvertedIndex.build(corpus, text_col="content")

    queries = spark.createDataFrame(
        [("q0", "tok0001 tok0002"), ("q1", "uniq00003doc tok0004 tok0001")],
        "query_id string, text string",
    )
    qtp = query_term_positions(queries)

    # postings parity including positions
    got = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in seg.postings_for_query_terms(qtp, with_positions=True)
        .collect()
    }
    qterms = [r["term"] for r in qtp.select("term").distinct().collect()]
    want = {
        (r["term"], r["doc_id"]): list(r["positions"])
        for r in v1.doc_terms.filter(F.col("term").isin(qterms)).collect()
    }
    assert got == want and len(got) > 0

    # positional_verify parity: persisted path == v1 path
    pv_seg = positional_verify(
        seg.postings_for_query_terms(qtp, with_positions=True), queries
    )
    pv_v1 = positional_verify(v1.doc_terms, queries)
    key = lambda r: (r["query_id"], r["doc_id"])  # noqa: E731
    a = {key(r): (r["best_delta"], r["aligned_count"]) for r in pv_seg.collect()}
    b = {key(r): (r["best_delta"], r["aligned_count"]) for r in pv_v1.collect()}
    assert a == b and len(a) > 0

    # positions-free decode of the same blocks still works (BM25 path)
    n = seg.postings_for_query_terms(qtp).count()
    assert n == len(got)


def test_batched_encoder_matches_encode_block(spark):
    """The vectorized partition encoder must emit byte-identical
    payloads to the reference single-block codec (encode_block), for
    both layouts (with/without positions), across group/block
    boundaries and negative doc_ids."""
    import numpy as np
    import pandas as pd

    from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
        encode_block,
    )
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
        _encode_partition,
    )

    rng = np.random.RandomState(3)
    rows = []
    for term, salt, n_docs in [("a", 0, 1), ("a", 1, 7), ("b", 0, 5),
                               ("c", 0, 11)]:
        ids = np.unique(
            rng.randint(-2**61, 2**61, size=n_docs * 2).astype(np.int64)
        )[:n_docs]
        for d in ids:
            tf = int(rng.randint(1, 5))
            pos = np.sort(rng.choice(1000, size=tf, replace=False))
            rows.append({"bucket": 0, "term": term, "salt": salt,
                         "doc_id": int(d), "tf": tf,
                         "doc_len": int(rng.randint(10, 500)),
                         "positions": pos.astype(np.int64)})
    pdf = pd.DataFrame(rows).sort_values(
        ["term", "salt", "doc_id"], ignore_index=True
    )

    for store_pos in (False, True):
        got = pd.concat(
            list(_encode_partition(300.0, 4, store_pos)(iter([pdf]))),
            ignore_index=True,
        )
        # expected: per (term, salt) group, blocks of 4 via encode_block
        exp = {}
        for (term, salt), g in pdf.groupby(["term", "salt"], sort=True):
            g = g.sort_values("doc_id")
            ids = g["doc_id"].to_numpy(np.int64)
            tfs = g["tf"].to_numpy(np.int64)
            dls = g["doc_len"].to_numpy(np.int64)
            pos = np.concatenate([np.asarray(p) for p in g["positions"]])
            offs = np.concatenate(([0], np.cumsum(tfs)))
            for seq, s in enumerate(range(0, len(ids), 4)):
                e = min(s + 4, len(ids))
                p = pos[offs[s]:offs[e]] if store_pos else None
                exp[(term, salt, seq)] = encode_block(
                    ids[s:e], tfs[s:e], dls[s:e], p
                )
        assert len(got) == len(exp)
        for _, r in got.iterrows():
            want = exp[(r["term"], int(r["salt"]), int(r["block_seq"]))]
            assert bytes(r["payload"]) == want, (
                r["term"], r["salt"], r["block_seq"], store_pos
            )
