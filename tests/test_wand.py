"""Block-max WAND: exact top-k equality with the brute-force segment
path, plus evidence that bound-gated block skipping actually skips."""

from __future__ import annotations

import math

import pytest

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
    build_segment_index,
    segment_topk,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.wand import (
    wand_topk,
)


@pytest.fixture(scope="module")
def seg(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("wandidx"))
    corpus = with_doc_id(corpus_df)
    # small blocks + low hot_df → many blocks per term → skippable work
    build_segment_index(spark, corpus, d, n_buckets=4, hot_df=8, block_size=8)
    return SegmentIndex.open(spark, d)


@pytest.mark.parametrize("k", [1, 3, 10])
def test_wand_equals_bruteforce(spark, seg, queries_df, k):
    got = wand_topk(seg, queries_df, k=k).orderBy("query_id", "rank").collect()
    want = segment_topk(seg, queries_df, k=k).orderBy("query_id", "rank").collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert (g["query_id"], g["rank"], g["doc_id"]) == (
            w["query_id"], w["rank"], w["doc_id"],
        ), f"k={k}: {g} vs {w}"
        assert math.isclose(g["score"], w["score"], rel_tol=1e-9, abs_tol=1e-12)


def test_wand_prunes_blocks(spark, seg, queries_df):
    rows = wand_topk(seg, queries_df, k=1).collect()
    assert rows, "no results"
    decoded = sum({r["query_id"]: r["blocks_decoded"] for r in rows}.values())
    total = sum({r["query_id"]: r["blocks_total"] for r in rows}.values())
    assert decoded < total, f"no pruning: decoded {decoded}/{total} blocks"


def test_wand_micro_mode_matches_float_ranks(spark, seg, queries_df):
    """micro=True (exact integer micro-unit scoring, the driver-oracle
    convention) must produce the same (query, rank, doc) triples as
    float mode, and its score_micro must equal the float score rounded
    HALF_UP per posting — here checked end-to-end as total-score
    proximity (sum of per-term rounding errors < n_terms micro)."""
    fl = wand_topk(seg, queries_df, k=5).orderBy("query_id", "rank").collect()
    mi = wand_topk(seg, queries_df, k=5, micro=True)\
        .orderBy("query_id", "rank").collect()
    assert [(r["query_id"], r["rank"], r["doc_id"]) for r in fl] == \
           [(r["query_id"], r["rank"], r["doc_id"]) for r in mi]
    for f, m in zip(fl, mi):
        assert abs(m["score_micro"] - f["score"] * 1e6) <= f["matched_terms"]


def test_wand_oov_query_yields_nothing(spark, seg):
    q = spark.createDataFrame(
        [("qx", "zzqabsent wwqmissing")], "query_id string, text string"
    )
    assert wand_topk(seg, q, k=5).count() == 0


def test_interval_kernel_covers_max_int64_doc_id():
    """A doc whose id is exactly 2**63-1 (one xxhash64 in 2**64 inputs)
    must not fall out of interval coverage: the hi+1 interval cut is
    clamped against int64 overflow, and the widened last interval has
    to absorb the clamp so WAND stays exactly equal to brute force."""
    import numpy as np
    import pandas as pd

    from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
        encode_block,
    )
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.wand import (
        _Term,
        _topk_one_query,
    )

    max_id = np.int64(2**63 - 1)
    ids = np.array([5, 100, max_id], dtype=np.int64)
    tfs = np.array([1, 2, 3], dtype=np.int64)
    dls = np.array([10, 10, 10], dtype=np.int64)
    g = pd.DataFrame({
        "doc_id_lo": [int(ids[0])], "doc_id_hi": [int(ids[-1])],
        "max_tf": [3], "min_dl": [10],
        "payload": [encode_block(ids, tfs, dls)],
    })
    term = _Term(idf=1.0, g=g, avgdl=10.0)
    docs, scores, matched, decoded, total = _topk_one_query(
        [term], k=3, avgdl=10.0
    )
    assert int(max_id) in set(int(d) for d in docs), (
        "doc at int64 max silently dropped by interval construction"
    )
    assert len(docs) == 3
    # highest tf (the max-id doc) must rank first
    assert int(docs[0]) == int(max_id)


def test_interval_kernel_covers_lone_max_block_among_other_cuts():
    """The residual of the clamp fix: a block with lo == hi ==
    int64_max COEXISTING with other blocks' cuts. searchsorted
    resolves the widened last interval to an earlier block, so the
    lone max block must be force-selected (and its bound added to the
    interval's ub) or its doc silently vanishes."""
    import numpy as np
    import pandas as pd

    from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
        encode_block,
    )
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.wand import (
        _Term,
        _topk_one_query,
    )

    max_id = np.int64(2**63 - 1)

    def blk(ids, tfs):
        ids = np.array(ids, dtype=np.int64)
        tfs = np.array(tfs, dtype=np.int64)
        dls = np.full(ids.size, 10, dtype=np.int64)
        return {
            "doc_id_lo": int(ids[0]), "doc_id_hi": int(ids[-1]),
            "max_tf": int(tfs.max()), "min_dl": 10,
            "payload": encode_block(ids, tfs, dls),
        }

    # term A: two blocks — [5,100] and the lone [max,max] block
    ga = pd.DataFrame([blk([5, 100], [1, 2]), blk([max_id], [3])])
    # term B: one block whose cuts make the last interval start BELOW
    # max (so searchsorted picks B's block, never A's max block)
    gb = pd.DataFrame([blk([7, 200], [1, 1])])
    ta = _Term(idf=1.0, g=ga, avgdl=10.0)
    tb = _Term(idf=1.0, g=gb, avgdl=10.0)
    docs, scores, matched, decoded, total = _topk_one_query(
        [ta, tb], k=5, avgdl=10.0
    )
    got = set(int(d) for d in docs)
    assert int(max_id) in got, (
        "lone [max,max] block dropped when coexisting with other cuts"
    )
    assert got == {5, 7, 100, 200, int(max_id)}
    # highest tf (the max-id doc) must rank first
    assert int(docs[0]) == int(max_id)
