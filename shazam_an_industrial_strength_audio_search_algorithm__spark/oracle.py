"""Single-node pandas/dict oracle — the rank-identity reference for
every engine test (SURVEY §5.2, build plan §7.2).

Structurally this IS the reference pipeline with BM25 swapped in for
histogram voting:

- ``OracleIndex.add``       ↔ ``addLUT``            (``utils/_Shazam_.py:462-469``)
- ``OracleIndex.remove``    ↔ ``removeLUT``          (``utils/_Shazam_.py:470-481``,
                              incl. drop-empty-keys at :478-479)
- ``OracleIndex.candidates``↔ ``searchLUT_v2``       (``utils/_Shazam_.py:494-506``)
- ``OracleIndex.topk``      ↔ ranked-candidate loop  (``utils/Matching.py:120-139``)
- threshold "doc or Nil"    ↔ ``num_matches > th``   (``utils/Matching.py:127``)
- second-best tracking      ↔ ``Unmatched_Dict``     (``utils/Matching.py:133-139``)

Tie-break is deterministic ``(score DESC, doc_id ASC)`` — the
reference's ``Counter.most_common`` insertion-order tie (SURVEY §2.5
W2) made explicit.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

import pandas as pd

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.bm25 import (
    score_py,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.tokenize import (
    tokenize_py,
)


@dataclass
class OracleIndex:
    # term -> {doc_id -> tf}; the LUT with tf instead of a bare doc set
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    # term -> {doc_id -> positions list} (for phrase/positional checks)
    positions: dict[str, dict[int, list[int]]] = field(default_factory=dict)

    @property
    def n_docs(self) -> int:
        return len(self.doc_len)

    @property
    def avgdl(self) -> float:
        return sum(self.doc_len.values()) / max(1, self.n_docs)

    def add(self, doc_id: int, text: str) -> None:
        """Upsert one doc (overwrite-by-key, ``Hashing_update.py:60-81``)."""
        if doc_id in self.doc_len:
            self.remove(doc_id)
        toks = tokenize_py(text)
        if not toks:  # [None, None] sentinel analog (_Shazam_.py:247,280)
            return
        self.doc_len[doc_id] = len(toks)
        tf = Counter(toks)
        for term, c in tf.items():
            self.postings.setdefault(term, {})[doc_id] = c
        for pos, term in enumerate(toks):
            self.positions.setdefault(term, {}).setdefault(doc_id, []).append(pos)

    def remove(self, doc_id: int) -> None:
        """Delete + garbage-collect empty terms (``_Shazam_.py:470-481``)."""
        if doc_id not in self.doc_len:
            return  # ignored-skip semantics (Hashing_update.py:89-93)
        del self.doc_len[doc_id]
        for table in (self.postings, self.positions):
            empty = []
            for term, docs in table.items():
                docs.pop(doc_id, None)
                if not docs:
                    empty.append(term)
            for term in empty:
                del table[term]

    @classmethod
    def build(cls, docs: pd.DataFrame, id_col: str = "doc_id",
              text_col: str = "content") -> "OracleIndex":
        idx = cls()
        for _, row in docs.iterrows():
            idx.add(int(row[id_col]), row[text_col])
        return idx

    def candidates(self, q_terms: list[str]) -> Counter:
        """Candidate generation: per-doc count of distinct matched query
        terms (``searchLUT_v2``'s Counter over posting sets)."""
        c: Counter = Counter()
        for term in set(q_terms):
            c.update(self.postings.get(term, {}).keys())
        return c

    def score(self, q_terms: list[str], doc_id: int) -> float:
        n, avgdl, dl = self.n_docs, self.avgdl, self.doc_len[doc_id]
        s = 0.0
        # fixed summation order: sorted distinct terms (determinism contract)
        for term in sorted(set(q_terms)):
            docs = self.postings.get(term)
            if docs and doc_id in docs:
                s += score_py(docs[doc_id], len(docs), dl, n, avgdl)
        return s

    def topk(self, query_text: str, k: int = 10) -> list[tuple[int, float]]:
        """Ranked top-k: (doc_id, score), score DESC, doc_id ASC."""
        q_terms = tokenize_py(query_text)
        scored = [(d, self.score(q_terms, d)) for d in self.candidates(q_terms)]
        scored.sort(key=lambda t: (-t[1], t[0]))
        return scored[:k]

    def decide(self, query_text: str, k: int = 10, threshold: float = 1.0):
        """The reference's per-query outcome triple:
        (matched_doc_or_None, topk_list, second_best_or_None)."""
        top = self.topk(query_text, k)
        matched = top[0][0] if top and top[0][1] > threshold else None
        second = top[1] if matched is not None and len(top) > 1 else (
            top[0] if top and matched is None else None)
        return matched, top, second


def oracle_topk_frame(idx: OracleIndex, queries: pd.DataFrame, k: int = 10,
                      id_col: str = "query_id", text_col: str = "text") -> pd.DataFrame:
    """Golden output (FIXTURES.md §3): query_id, rank, doc_id, score."""
    rows = []
    for _, q in queries.iterrows():
        for rank, (doc_id, score) in enumerate(idx.topk(q[text_col], k), start=1):
            rows.append((q[id_col], rank, doc_id, score))
    return pd.DataFrame(rows, columns=["query_id", "rank", "doc_id", "score"])
