"""Block-max WAND top-k executor over the segment index.

Reference parity: the reference ranks candidates by shared-key count
and evaluates them in that order, stopping at the first one above the
threshold (``searchLUT_v2`` ordering ``_Shazam_.py:505`` + the
first-above-threshold break ``Matching.py:122-131``) — i.e.
upper-bound-ordered evaluation with early exit. Block-max WAND is the
principled generalization (SURVEY §4): per-term posting streams are
walked document-at-a-time; a pivot is chosen where the sum of term
upper bounds first reaches the current top-k floor; blocks whose
upper bound cannot beat the floor are skipped without decoding.

Execution shape: the candidate **blocks** (compressed payloads +
bounds, no decoding) shuffle once, grouped per query; the WAND loop
runs inside ``applyInPandas`` with numpy-decoded blocks on demand.
Query count is the small axis (the reference's nj=32 splits), so one
group per query parallelizes across the cluster; the heavy axis —
posting volume — is touched only through bound-gated decodes.

Bounds are recomputed from stored raw stats (max_tf, min_dl) under
the CURRENT snapshot's avgdl, so pruning stays safe after incremental
updates shift global stats (see segments.py).

Exactness: returned top-k docs and scores are identical to the
brute-force path (test_wand.py asserts equality with segment_topk);
scores accumulate per doc in ascending term order for determinism.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.bm25 import (
    B,
    K1,
    idf_py,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
    decode_block,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
)

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.StringType()),
        T.StructField("rank", T.IntegerType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("blocks_decoded", T.IntegerType()),
        T.StructField("blocks_total", T.IntegerType()),
    ]
)

_SENTINEL = (1 << 63) - 1  # past-the-end doc id


class _TermStream:
    """One term's ordered block list with lazy decode + seek."""

    __slots__ = ("idf", "blocks", "bounds", "bi", "ids", "tfs", "dls",
                 "off", "decoded", "ub")

    def __init__(self, idf: float, blocks: list, avgdl: float):
        # blocks: list of (doc_id_lo, doc_id_hi, max_tf, min_dl, payload)
        # already sorted by doc_id_lo (disjoint ranges by construction)
        self.idf = idf
        self.blocks = blocks
        self.bounds = [
            idf * (mt / (mt + K1 * (1.0 - B + B * md / avgdl)))
            for (_, _, mt, md, _) in blocks
        ]
        self.ub = max(self.bounds) if self.bounds else 0.0  # term-level UB
        self.bi = 0
        self.ids = self.tfs = self.dls = None
        self.off = 0
        self.decoded = 0
        self._enter_block()

    def _enter_block(self):
        # position at the first doc of block bi WITHOUT decoding;
        # decode happens only when docs are actually consumed
        self.ids = None
        self.off = 0

    def current_bound(self) -> float:
        return self.bounds[self.bi] if self.bi < len(self.blocks) else 0.0

    def current_doc(self) -> int:
        if self.bi >= len(self.blocks):
            return _SENTINEL
        if self.ids is None:
            return self.blocks[self.bi][0]  # block's doc_id_lo, no decode
        return int(self.ids[self.off])

    def _decode(self):
        if self.ids is None:
            payload = self.blocks[self.bi][4]
            self.ids, self.tfs, self.dls = decode_block(bytes(payload))
            self.decoded += 1

    def seek(self, target: int):
        """Advance to the first doc >= target, skipping whole blocks
        by their [lo, hi] ranges (no decode for skipped blocks)."""
        while self.bi < len(self.blocks):
            lo, hi = self.blocks[self.bi][0], self.blocks[self.bi][1]
            if hi < target:
                self.bi += 1
                self._enter_block()
                continue
            if target <= lo:
                return
            self._decode()
            # binary search inside the block
            self.off = int(np.searchsorted(self.ids, target, side="left"))
            if self.off >= len(self.ids):
                self.bi += 1
                self._enter_block()
                continue
            return

    def score_current(self, avgdl: float) -> float:
        self._decode()
        tf = float(self.tfs[self.off])
        dl = float(self.dls[self.off])
        return self.idf * (tf / (tf + K1 * (1.0 - B + B * dl / avgdl)))

    def advance(self):
        self._decode()
        self.off += 1
        if self.off >= len(self.ids):
            self.bi += 1
            self._enter_block()


def _wand_one_query(streams: list[_TermStream], k: int, avgdl: float):
    """Document-at-a-time block-max WAND. Returns (results, decoded,
    total_blocks): results = [(doc_id, score)] sorted (score DESC,
    doc_id ASC), exact scores."""
    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    floor = -math.inf

    def theta():
        return heap[0][0] if len(heap) >= k else -math.inf

    while True:
        streams.sort(key=lambda s: s.current_doc())
        # pivot: first prefix whose UB sum can beat the floor
        ub = 0.0
        pivot = -1
        floor = theta()
        for i, s in enumerate(streams):
            if s.current_doc() == _SENTINEL:
                break
            ub += s.ub
            if ub > floor:
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = streams[pivot].current_doc()
        if pivot_doc == _SENTINEL:
            break
        if streams[0].current_doc() == pivot_doc:
            # block-max check: tighter bound from the CURRENT blocks
            bm = 0.0
            for s in streams:
                if s.current_doc() > pivot_doc:
                    break
                s.seek(pivot_doc)  # aligns block; cheap if already there
                if s.current_doc() == pivot_doc or (
                    s.bi < len(s.blocks) and s.blocks[s.bi][0] <= pivot_doc
                ):
                    bm += s.current_bound()
            if bm > floor:
                score = 0.0
                for s in streams:
                    if s.current_doc() == pivot_doc:
                        score += s.score_current(avgdl)
                for s in streams:
                    if s.current_doc() == pivot_doc:
                        s.advance()
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            else:
                for s in streams:
                    if s.current_doc() == pivot_doc:
                        s.advance()
        else:
            # advance the leading stream with the largest UB to pivot_doc
            lead = max(
                (s for s in streams if s.current_doc() < pivot_doc),
                key=lambda s: s.ub,
            )
            lead.seek(pivot_doc)

    out = sorted(((s, -nd) for s, nd in heap), key=lambda t: (-t[0], t[1]))
    decoded = sum(s.decoded for s in streams)
    total = sum(len(s.blocks) for s in streams)
    return [(doc, sc) for sc, doc in out], decoded, total


def wand_topk(
    index: SegmentIndex,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k via block-max WAND; exact same results as segment_topk,
    plus per-query decode counters (blocks_decoded / blocks_total) so
    tests and benches can assert pruning actually happened."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
        query_terms,
    )

    qt = query_terms(queries, id_col, text_col)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    blocks = index.blocks_for_terms(terms).select(
        "term", "df", "salt", "block_seq", "doc_id_lo", "doc_id_hi",
        "max_tf", "min_dl", "payload",
    )
    per_query = blocks.join(F.broadcast(qt), "term")
    n_docs, avgdl = index.n_docs, index.avgdl

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        qid = key[0]
        streams = []
        for term, g in pdf.groupby("term", sort=True):
            g = g.sort_values(["salt", "block_seq"])
            df_val = int(g["df"].iloc[0])
            blks = list(
                zip(
                    g["doc_id_lo"].astype("int64"),
                    g["doc_id_hi"].astype("int64"),
                    g["max_tf"].astype("int64"),
                    g["min_dl"].astype("int64"),
                    g["payload"],
                )
            )
            streams.append(_TermStream(idf_py(df_val, n_docs), blks, avgdl))
        results, decoded, total = _wand_one_query(streams, k, avgdl)
        return pd.DataFrame(
            {
                "query_id": qid,
                "rank": np.arange(1, len(results) + 1, dtype="int32"),
                "doc_id": np.array([d for d, _ in results], dtype="int64"),
                "score": np.array([s for _, s in results], dtype="float64"),
                "blocks_decoded": np.int32(decoded),
                "blocks_total": np.int32(total),
            }
        )

    # pin parallelism: the WAND loop is CPU-bound Python per query —
    # don't let AQE coalesce the (small-bytes) shuffle under the core
    # count and serialize it
    n_part = int(
        index.spark.conf.get("spark.sql.shuffle.partitions")
    )
    return (
        per_query.repartition(n_part, "query_id")
        .groupBy("query_id")
        .applyInPandas(run, schema=RESULT_SCHEMA)
    )
