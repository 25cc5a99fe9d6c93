"""Boolean retrieval (round 5): must / must-not / prefix clauses over
the segment index (``operators/boolean.py``), pinned against a pure
pandas evaluation of the same specs on the same corpus — and against a
LAYERED index, so the clauses are proven to ride the merge-on-read
tombstone resolution the ranked paths use."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.tokenize import (
    tokenize_py,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.boolean import (
    boolean_search,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.maintenance import (
    apply_updates,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
    build_segment_index,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.sources.corpus import (
    make_corpus,
)

# make_corpus vocabulary is Zipf over tok0000..tok4999 (+ one
# uniqNNNNNdoc rare term per doc)
SPECS = [
    # (query_id, must, must_not, prefix)
    ("b0", ["tok0000", "tok0001"], ["tok0007"], "tok001"),
    ("b1", ["tok0002", "tok0004"], ["tok0011"], "uniq"),
    ("b2", ["tok0003", "tok0005"], [], "tok02"),
    ("b3", ["nosuchterm1", "nosuchterm2"], [], "xx"),  # empty result
]


def _expected(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, doc in pdf.iterrows():
        toks = set(tokenize_py(doc["content"]))
        for qid, must, must_not, pfx in SPECS:
            if not all(m in toks for m in must):
                continue
            if any(m in toks for m in must_not):
                continue
            npfx = len({t for t in toks if t.startswith(pfx)})
            if npfx == 0:
                continue
            rows.append((qid, int(doc["doc_id"]), npfx))
    return pd.DataFrame(
        rows, columns=["query_id", "doc_id", "n_prefix_terms"]
    ).sort_values(["query_id", "doc_id"], ignore_index=True)


def _specs_df(spark):
    return spark.createDataFrame(
        [(q, m, mn, p) for q, m, mn, p in SPECS],
        "query_id string, must array<string>, must_not array<string>, "
        "prefix string",
    )


def _run(spark, idx) -> pd.DataFrame:
    out = boolean_search(idx, _specs_df(spark)).toPandas()
    out["doc_id"] = out["doc_id"].astype(int)
    out["n_prefix_terms"] = out["n_prefix_terms"].astype(int)
    return out.sort_values(["query_id", "doc_id"], ignore_index=True)


@pytest.fixture(scope="module")
def corpus(spark):
    pdf = make_corpus(n_docs=60, seed=91, min_len=40, max_len=200)
    df = with_doc_id(spark.createDataFrame(pdf))
    ids = {r["path"]: r["doc_id"]
           for r in df.select("path", "doc_id").collect()}
    pdf = pdf.assign(doc_id=pdf["path"].map(ids))
    return pdf, df


def test_boolean_matches_pandas_oracle(spark, corpus, tmp_path):
    pdf, df = corpus
    d = str(tmp_path / "idx")
    build_segment_index(spark, df, d, n_buckets=4, hot_df=16,
                        block_size=16)
    got = _run(spark, SegmentIndex.open(spark, d))
    want = _expected(pdf)
    assert not want.empty, "fixture produced no matches — weaken specs"
    pd.testing.assert_frame_equal(got, want)


def test_boolean_on_layered_index(spark, corpus, tmp_path):
    """Deletes must disappear from every clause: a doc matching b2
    gets tombstoned via a delta update; re-added docs must reappear."""
    pdf, df = corpus
    d = str(tmp_path / "idx")
    build_segment_index(spark, df, d, n_buckets=4, hot_df=16,
                        block_size=16, id_col="doc_id",
                        text_col="content")
    want_full = _expected(pdf)
    victims = want_full[want_full["query_id"] == "b2"]["doc_id"].head(3)
    victim_ids = [int(v) for v in victims]
    assert victim_ids, "need at least one b2 match to delete"

    apply_updates(
        spark, d,
        delete_keys=spark.createDataFrame(
            [(v,) for v in victim_ids], "doc_id long"),
        mode="delta", explicit_ids=True,
    )
    idx = SegmentIndex.open(spark, d)
    assert idx.has_deltas
    got = _run(spark, idx)
    want = want_full[~want_full["doc_id"].isin(victim_ids)].reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got, want)

    # re-add one victim (same content) — it must reappear everywhere
    back = df.filter(F.col("doc_id") == victim_ids[0])
    apply_updates(spark, d, add_corpus=back, mode="delta",
                  explicit_ids=True)
    got2 = _run(spark, SegmentIndex.open(spark, d))
    want2 = want_full[
        ~want_full["doc_id"].isin(victim_ids[1:])
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, want2)


def test_prefix_scan_only_matching_terms(spark, corpus, tmp_path):
    pdf, df = corpus
    d = str(tmp_path / "idx")
    build_segment_index(spark, df, d, n_buckets=4, hot_df=16,
                        block_size=16)
    idx = SegmentIndex.open(spark, d)
    terms = {
        r["term"]
        for r in idx.postings_for_term_prefixes(["tok001", "uniq"])
        .select("term").distinct().collect()
    }
    assert terms, "prefix scan returned nothing"
    assert all(t.startswith(("tok001", "uniq")) for t in terms)
    all_terms = {t for txt in pdf["content"] for t in tokenize_py(txt)}
    assert terms == {t for t in all_terms
                     if t.startswith(("tok001", "uniq"))}
    # empty prefix list → empty frame, not a full scan
    assert idx.postings_for_term_prefixes([]).count() == 0
