"""Block-max top-k executor over the segment index (exact, pruned).

Reference parity: the reference ranks candidates by shared-key count
and evaluates them in that order, stopping at the first one above the
threshold (``searchLUT_v2`` ordering ``_Shazam_.py:505`` + the
first-above-threshold break ``Matching.py:122-131``) — i.e.
upper-bound-ordered evaluation with early exit. This module is the
principled generalization (SURVEY §4): **interval-at-a-time block-max
WAND**. Doc-id space is partitioned into atomic intervals by the
block boundaries of the query's terms; each interval's upper bound is
the sum of the (single, because blocks of a term are disjoint)
overlapping block bound per term. Intervals are processed in
descending upper-bound order, scoring is numpy-vectorized per
interval, and the loop stops as soon as the running top-k floor
beats the best remaining interval bound — blocks in skipped
intervals are never decoded.

Execution shape: candidate blocks (compressed payloads + bounds, no
decoding) shuffle once, grouped per query; the interval loop runs in
``applyInPandas``. Queries are the small axis (the reference's nj=32
splits); the heavy axis — posting volume — is touched only through
bound-gated decodes.

Bounds are recomputed from stored raw stats (max_tf, min_dl) under
the CURRENT snapshot's avgdl, so pruning stays safe after incremental
updates shift global stats (see segments.py).

Exactness: returned top-k docs and scores are identical to the
brute-force path (tests/test_wand.py asserts equality at k=1/3/10);
per-doc scores are computed in one vectorized reduction, and the
deterministic tie-break (score DESC, doc_id ASC) is applied at the
end.
"""

from __future__ import annotations

import os

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
        T.StructField("matched_terms", T.IntegerType()),
        T.StructField("blocks_decoded", T.IntegerType()),
        T.StructField("blocks_total", T.IntegerType()),
    ]
)


class _Term:
    """One term-generation's blocks: boundary arrays + lazy per-block
    decode.

    The decode cache lives on the instance, so in batched execution
    (one ``_Term`` per term shared by every query in the group) a
    block decodes at most once per group; ``requested`` tracks which
    blocks the CURRENT query actually needed (reset per query), so
    per-query pruning counters stay meaningful under sharing.

    Layered (merge-on-read) snapshots instantiate one ``_Term`` per
    (term, generation): within one generation blocks stay doc-range
    disjoint and sorted (doc-id-range salts, segments.py), so the
    interval machinery is unchanged — overlap across generations is
    expressed as extra pseudo-terms, and a doc's postings live in
    exactly one ALIVE generation per term (upserts tombstone the
    older generations), so per-doc sums and ``matched_terms`` stay
    exact. ``tomb`` = (sorted doc_ids, tomb_seq) arrays; a posting at
    ``gen`` is dead iff its doc has a tombstone with seq > gen.
    Deletions only SHRINK a block's true max score, so the stored
    max_tf/min_dl bounds remain safe upper bounds without rewrite."""

    __slots__ = ("idf", "los", "his", "bounds", "payloads", "cache",
                 "requested", "micro", "gen", "tomb", "raw_cache",
                 "_bound_base")

    def __init__(self, idf: float | None, g: pd.DataFrame, avgdl: float,
                 micro: bool = False, gen: int = 0,
                 tomb: tuple[np.ndarray, np.ndarray] | None = None):
        self.micro = micro
        self.gen = gen
        self.tomb = tomb
        self.los = g["doc_id_lo"].to_numpy(np.int64)
        self.his = g["doc_id_hi"].to_numpy(np.int64)
        mt = g["max_tf"].to_numpy(np.float64)
        md = g["min_dl"].to_numpy(np.float64)
        # idf-free factor; set_idf scales it into the final bounds —
        # on layered snapshots the exact idf is only known after the
        # tombstone-dead df prepass ran over every generation
        self._bound_base = mt / (mt + K1 * (1.0 - B + B * md / avgdl))
        self.payloads = list(g["payload"])
        self.cache: dict[int, tuple] = {}
        self.raw_cache: dict[int, tuple] = {}
        self.requested: set[int] = set()
        if idf is not None:
            self.set_idf(idf)

    def set_idf(self, idf: float) -> None:
        self.idf = idf
        bounds = idf * self._bound_base
        if self.micro:
            # integer micro-unit scoring: the per-posting contribution
            # is HALF_UP-rounded to micro BEFORE summing (the driver
            # oracle's order-independent convention); the block bound
            # over-estimates by 1 micro so pruning stays safe
            self.bounds = np.floor(bounds * 1e6 + 0.5).astype(np.int64) + 1
        else:
            self.bounds = bounds

    def _raw(self, bi: int):
        if bi not in self.raw_cache:
            self.raw_cache[bi] = decode_block(bytes(self.payloads[bi]))
        return self.raw_cache[bi]

    def _alive_mask(self, ids: np.ndarray) -> np.ndarray | None:
        """Boolean mask of postings NOT superseded by a tombstone, or
        None when every posting is alive (fast path)."""
        if self.tomb is None:
            return None
        t_ids, t_seqs = self.tomb
        pos = np.searchsorted(t_ids, ids)
        pos_c = np.minimum(pos, t_ids.size - 1)
        hit = (pos < t_ids.size) & (t_ids[pos_c] == ids)
        dead = hit & (t_seqs[pos_c] > self.gen)
        if not dead.any():
            return None
        return ~dead

    def dead_count(self, bi: int) -> int:
        """Tombstone-superseded postings in block bi (df prepass)."""
        ids, _, _ = self._raw(bi)
        mask = self._alive_mask(ids)
        return 0 if mask is None else int(ids.size - mask.sum())

    def slice(self, bi: int, start: np.int64, end: np.int64, avgdl: float):
        """(doc_ids, contribs) of block bi restricted to [start, end],
        tombstone-resolved on layered snapshots."""
        self.requested.add(bi)
        if bi not in self.cache:
            ids, tfs, dls = self._raw(bi)
            mask = self._alive_mask(ids)
            if mask is not None:
                ids, tfs, dls = ids[mask], tfs[mask], dls[mask]
            contribs = self.idf * (
                tfs / (tfs + K1 * (1.0 - B + B * dls.astype(np.float64) / avgdl))
            )
            if self.micro:
                contribs = np.floor(contribs * 1e6 + 0.5).astype(np.int64)
            self.cache[bi] = (ids, contribs)
            # the raw decode is only re-read by the df prepass, which
            # runs before any slicing — don't hold both copies
            self.raw_cache.pop(bi, None)
        ids, contribs = self.cache[bi]
        s = int(np.searchsorted(ids, start, side="left"))
        e = int(np.searchsorted(ids, end, side="right"))
        return ids[s:e], contribs[s:e]


def _pseudo_terms(g: pd.DataFrame, n_docs: int, avgdl: float,
                  micro: bool,
                  tomb: tuple[np.ndarray, np.ndarray] | None,
                  ) -> list[_Term]:
    """One term's block rows (layered: spanning generations) → the
    list of ``_Term`` pseudo-terms sharing one EXACT idf.

    Exact df on a merge-on-read snapshot = Σ per-generation stored df
    − tombstone-superseded postings; the dead count decodes ONLY
    blocks whose doc-id range contains a tombstoned doc (bounded by
    delta size, and those decodes pre-warm the slice cache's raw
    side) — the kernel twin of ``SegmentIndex._resolve_layers``'s df
    recompute, without touching the un-tombstoned bulk. A term whose
    alive df reaches 0 is dropped entirely (all postings dead)."""
    pts: list[_Term] = []
    df_total = 0
    for gen, gg in g.groupby("gen_seq", sort=True):
        g2 = gg.sort_values(["salt", "block_seq"])
        df_total += int(g2["df"].iloc[0])
        pts.append(_Term(None, g2, avgdl, micro=micro, gen=int(gen),
                         tomb=tomb))
    dead = 0
    if tomb is not None:
        t_ids, t_seqs = tomb
        for pt in pts:
            rel = t_ids[t_seqs > pt.gen]
            if not rel.size:
                continue
            bi = np.searchsorted(pt.los, rel, side="right") - 1
            ok = (bi >= 0) & (pt.his[np.clip(bi, 0, None)] >= rel)
            for b in np.unique(bi[ok]):
                dead += pt.dead_count(int(b))
    df_exact = df_total - dead
    if df_exact <= 0:
        return []
    idf = idf_py(df_exact, n_docs)
    for pt in pts:
        pt.set_idf(idf)
    return pts


def _topk_one_query(terms: list[_Term], k: int, avgdl: float):
    """Interval-at-a-time block-max top-k. Returns (doc_ids, scores,
    matched, decoded, total_blocks), ranked (score DESC, doc_id ASC)."""
    # atomic intervals: cut doc space at every block lo and hi+1. The
    # hi+1 cut is clamped to avoid int64 overflow when a block ends at
    # the max doc_id; the widened last interval below restores coverage
    # of that doc (slice() selects by VALUE, so a too-wide interval end
    # can never pull in docs a block doesn't contain).
    int64_max = np.int64(2**63 - 1)
    clamped = any(bool((t.his == int64_max).any()) for t in terms)
    cuts = np.unique(
        np.concatenate(
            [t.los for t in terms]
            + [np.minimum(t.his, int64_max - 1) + 1 for t in terms]
        )
    )
    starts = cuts[:-1]
    ends = cuts[1:] - 1  # inclusive
    if clamped:
        if ends.size:
            ends[-1] = int64_max
        else:  # single block with lo == hi == int64_max
            starts = np.array([int64_max], dtype=np.int64)
            ends = np.array([int64_max], dtype=np.int64)
    n_int = starts.size
    if n_int == 0:
        return (np.zeros(0, np.int64), np.zeros(0), np.zeros(0, np.int32),
                0, sum(len(t.payloads) for t in terms))

    # per (interval, term): overlapping block index (or -1) and bound
    blk = np.full((len(terms), n_int), -1, dtype=np.int64)
    ub = np.zeros(n_int, dtype=np.float64)
    for ti, t in enumerate(terms):
        i = np.searchsorted(t.los, starts, side="right") - 1
        valid = (i >= 0) & (t.his[np.clip(i, 0, None)] >= starts)
        blk[ti] = np.where(valid, i, -1)
        ub += np.where(valid, t.bounds[np.clip(i, 0, None)], 0.0)

    # clamped residual: a block with lo == hi == int64_max that
    # coexists with earlier cuts is invisible to the searchsorted
    # selection above (the widened last interval's start resolves to
    # an earlier block whose hi < start) — force-select it for the
    # last interval, and add its bound to that interval's ub so the
    # pruning gate can never skip an interval it could win.
    forced: list[tuple[int, int]] = []
    if clamped and n_int > 0:
        last = n_int - 1
        for ti, t in enumerate(terms):
            bi = len(t.los) - 1
            if t.los[bi] == int64_max and int(blk[ti, last]) != bi:
                forced.append((ti, bi))
                ub[last] += t.bounds[bi]

    order = np.argsort(-ub, kind="stable")
    top_docs: np.ndarray = np.zeros(0, np.int64)
    top_scores: np.ndarray = np.zeros(0, np.float64)
    top_matched: np.ndarray = np.zeros(0, np.int32)
    floor = -np.inf

    for ii in order:
        if ub[ii] <= 0:
            break
        if top_docs.size >= k and ub[ii] < floor:
            # no remaining interval can beat the floor (strict: a doc
            # achieving EXACTLY the floor could still win the doc_id
            # tie-break, so ub == floor intervals are processed)
            break
        s, e = starts[ii], ends[ii]
        ids_parts, c_parts = [], []
        for ti, t in enumerate(terms):
            bi = int(blk[ti, ii])
            if bi >= 0:
                ids_p, c_p = t.slice(bi, s, e, avgdl)
                if ids_p.size:
                    ids_parts.append(ids_p)
                    c_parts.append(c_p)
        if forced and ii == n_int - 1:
            for ti, bi in forced:
                ids_p, c_p = terms[ti].slice(bi, s, e, avgdl)
                if ids_p.size:
                    ids_parts.append(ids_p)
                    c_parts.append(c_p)
        if not ids_parts:
            continue
        ids = np.concatenate(ids_parts)
        contribs = np.concatenate(c_parts)
        uniq, inv = np.unique(ids, return_inverse=True)
        scores = np.zeros(uniq.size)
        np.add.at(scores, inv, contribs)
        matched = np.zeros(uniq.size, dtype=np.int32)
        np.add.at(matched, inv, 1)
        # merge into running top-k
        top_docs = np.concatenate([top_docs, uniq])
        top_scores = np.concatenate([top_scores, scores])
        top_matched = np.concatenate([top_matched, matched])
        if top_docs.size > k:
            sel = np.lexsort((top_docs, -top_scores))[:k]
            top_docs, top_scores, top_matched = (
                top_docs[sel], top_scores[sel], top_matched[sel],
            )
        if top_docs.size >= k:
            floor = float(top_scores.min())

    sel = np.lexsort((top_docs, -top_scores))[:k]
    decoded = sum(len(t.requested) for t in terms)
    total = sum(len(t.payloads) for t in terms)
    return (top_docs[sel], top_scores[sel], top_matched[sel], decoded, total)


def wand_topk(
    index: SegmentIndex,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "query_id",
    text_col: str = "text",
    n_groups: int | None = None,
    micro: bool = False,
) -> DataFrame:
    """Top-k via interval-at-a-time block-max WAND; exact same results
    as segment_topk, plus per-query decode counters
    (blocks_decoded / blocks_total) so tests and benches can assert
    pruning actually happened. Serves LAYERED (merge-on-read)
    snapshots exactly too — see the layered block below — so upsert
    pipelines never need a compaction barrier before querying.

    Batched execution: queries are hashed into ``n_groups`` groups
    (default = max(shuffle partitions, index.n_buckets) — each group
    is a single-task kernel, so group count must scale WITH the
    index's bucket count: measured at 4M docs / 128 buckets, 64
    groups serialized the kernel leg at 1892 ms/q while 128 groups
    served at 962, and at ≤32 buckets the max() leaves the previous
    shuffle-partitions default untouched; see BENCH/BASELINE.md
    round-4 knob table) and each candidate block shuffles
    ONCE per group whose queries touch its term — not once per query.
    With a Q-query batch sharing hot terms this cuts shuffled payload
    bytes by ~Q/n_groups, and queries inside a group share one decode
    cache per term, so a hot term's blocks decode once for the whole
    group. Per-query results are bit-identical to one-query-per-group
    execution (the kernel is unchanged; only placement and caching
    change).

    ``micro=True`` switches the kernel to exact integer micro-unit
    scoring: each per-posting BM25 contribution is HALF_UP-rounded to
    a micro int BEFORE summing (the driver oracle's order-independent
    hash convention), block bounds over-estimate by 1 micro so the
    pruning proof still holds, and the result column is
    ``score_micro`` (long) instead of ``score`` (double) — making the
    pruned executor directly comparable against the same ANSI-SQL
    oracle as the brute-force paths."""
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
        query_terms,
    )

    # Layered (merge-on-read) snapshots are served EXACTLY without a
    # compaction barrier: each (term, generation) becomes its own
    # pseudo-term (within one generation blocks stay doc-range
    # disjoint — doc-id-range salts), slices resolve tombstones
    # vectorized, and idf is recomputed exactly from per-generation
    # stored df minus tombstone-dead postings (see _pseudo_terms).
    # Stored max_tf/min_dl stay SAFE upper bounds under deletion, so
    # pruning never changes a result; it just loses sharpness as
    # layers pile up — CompactionPolicy restores peak speed, it no
    # longer gates servability. The tombstone set is delta-sized by
    # policy; it ships to the kernel via task closure, capped so an
    # un-compacted pipeline fails loudly instead of shipping an
    # unbounded set.
    tomb_np: tuple[np.ndarray, np.ndarray] | None = None
    if index.has_deltas:
        tomb_df = index.tombstones()
        if tomb_df is not None:
            cap = int(os.environ.get("SPARK_GRAFT_WAND_TOMB_CAP",
                                     2_000_000))
            tmax = tomb_df.groupBy("doc_id").agg(
                F.max("gen_seq").alias("tomb_seq")
            )
            tp = tmax.toPandas()
            if len(tp) > cap:
                raise ValueError(
                    f"layered snapshot carries {len(tp):,} tombstoned "
                    f"docs (> cap {cap:,}) — run maintenance.compact() "
                    "or raise SPARK_GRAFT_WAND_TOMB_CAP"
                )
            if len(tp):
                tp = tp.sort_values("doc_id")
                tomb_np = (tp["doc_id"].to_numpy(np.int64),
                           tp["tomb_seq"].to_numpy(np.int64))
    # ship the tombstone arrays as a Spark BROADCAST, not closure
    # capture: a closure serializes into EVERY task (n_grp copies per
    # job — 128+ at scale × up to ~30 MB at the cap), a broadcast
    # ships once per executor and is torrent-distributed
    tomb_bc = (index.spark.sparkContext.broadcast(tomb_np)
               if tomb_np is not None else None)
    layered = index.has_deltas
    qt = query_terms(queries, id_col, text_col)
    # collect-free: bucket partitions prune dynamically from the
    # broadcast term side; no term list ever reaches the driver
    block_cols = [
        "term", "df", "salt", "block_seq", "doc_id_lo", "doc_id_hi",
        "max_tf", "min_dl", "payload",
    ] + (["gen_seq"] if layered else [])
    blocks = index.blocks_for_query_terms(qt).select(*block_cols)
    # pin parallelism: the per-query loop is CPU-bound Python/numpy —
    # don't let AQE coalesce the (small-bytes) shuffle under the core
    # count and serialize it
    n_part = int(index.spark.conf.get("spark.sql.shuffle.partitions"))
    n_grp = int(n_groups) if n_groups else max(n_part, index.n_buckets)
    qg = qt.withColumn(
        "grp", F.pmod(F.xxhash64(F.col("query_id")), F.lit(n_grp)).cast("int")
    )
    # one row per (group, term) with that group's query ids — the
    # block join fans out per GROUP, never per query
    gt = qg.groupBy("grp", "term").agg(
        F.collect_list("query_id").alias("qids")
    )
    per_group = blocks.join(F.broadcast(gt), "term")
    n_docs, avgdl = index.n_docs, index.avgdl
    score_name = "score_micro" if micro else "score"
    schema = T.StructType(
        [
            f if f.name != "score"
            else T.StructField(score_name,
                               T.LongType() if micro else T.DoubleType())
            for f in RESULT_SCHEMA
        ]
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tomb_local = tomb_bc.value if tomb_bc is not None else None
        terms: dict[str, list[_Term]] = {}
        q2t: dict[str, list[str]] = {}
        for term, g in pdf.groupby("term", sort=True):
            if layered:
                pts = _pseudo_terms(g, n_docs, avgdl, micro, tomb_local)
            else:
                g2 = g.sort_values(["salt", "block_seq"])
                pts = [_Term(idf_py(int(g2["df"].iloc[0]), n_docs), g2,
                             avgdl, micro=micro)]
            if not pts:
                continue  # every posting of the term is tombstoned
            terms[term] = pts
            for qid in g["qids"].iloc[0]:
                q2t.setdefault(qid, []).append(term)
        frames = []
        for qid in sorted(q2t):
            ts = [pt for t in q2t[qid] for pt in terms[t]]
            for t in ts:
                t.requested.clear()
            docs, scores, matched, decoded, total = _topk_one_query(
                ts, k, avgdl
            )
            n = docs.size
            frames.append(pd.DataFrame(
                {
                    "query_id": qid,
                    "rank": np.arange(1, n + 1, dtype="int32"),
                    "doc_id": docs,
                    # float64 accumulators are exact for micro ints
                    # (< 2^53), so this cast is lossless
                    score_name: scores.astype(np.int64) if micro else scores,
                    "matched_terms": matched,
                    "blocks_decoded": np.int32(decoded),
                    "blocks_total": np.int32(total),
                }
            ))
        if not frames:
            return pd.DataFrame(
                {f.name: pd.Series(dtype="object") for f in schema}
            )
        return pd.concat(frames, ignore_index=True)

    return (
        # repartition width must match the group count: with g groups
        # hashed over p partitions, only min(g, p) tasks can be
        # non-empty — widening one without the other changes nothing
        # (measured: 4M/128-bucket index at 64 tasks = 1892 ms/q,
        # at 128 groups AND 128 partitions = 962 ms/q)
        per_group.repartition(n_grp, "grp")
        .groupBy("grp")
        .applyInPandas(run, schema=schema)
    )
