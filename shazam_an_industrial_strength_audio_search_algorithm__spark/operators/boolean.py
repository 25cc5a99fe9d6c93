"""Boolean retrieval over the segment index: must / must-not / prefix.

Reference parity: the reference's candidate stage is a pure OR over
the query's fingerprint keys (``/root/reference/utils/_Shazam_.py:414``
intersects the query LUT with the database LUT key set and unions the
matching posting lists). A general fulltext engine additionally needs
the classic boolean connectives a code-search user types every day —
``foo AND bar AND NOT baz`` plus identifier-prefix clauses
(``merge*``). This module composes them from the SAME storage access
paths the ranked queries use, so boolean queries inherit bucket DPP,
pushed term predicates, and merge-on-read layer resolution for free:

- **must** (AND): postings for the distinct must terms, semi-joined
  per query; a doc survives when its distinct matched-term count
  equals the query's distinct must-term count — set intersection as
  one groupBy, never a per-term self-join chain (J1/SO1 generalized
  from 1 term to n).
- **must_not** (AND NOT): a ``left_anti`` join against the union of
  the excluded terms' postings (SO3, the maintenance delete path's
  join shape reused on the query side).
- **prefix**: a term-dictionary range scan
  (``SegmentIndex.blocks_for_term_prefixes`` — pushed ``StartsWith``
  over the term-clustered parquet); a doc survives when at least one
  indexed term under the query's prefix appears in it, and the count
  of distinct such terms is returned (``n_prefix_terms``).

Scale shape: each clause touches only the posting slice its terms
select; the three clause results join on (query_id, doc_id) — all
shuffles are bounded by posting-list volume of the query terms, never
corpus size. The prefix list is collected driver-side, bounded by the
QUERY count (one prefix per query), not by data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.segments import (
    SegmentIndex,
)


def boolean_search(index: SegmentIndex, specs: DataFrame) -> DataFrame:
    """Evaluate boolean query specs against the index.

    ``specs`` columns:
      - ``query_id``  string
      - ``must``      array<string> — doc must contain ALL (non-empty)
      - ``must_not``  array<string> — doc must contain NONE (may be empty)
      - ``prefix``    string — doc must contain ≥1 indexed term with
                      this prefix

    Returns (query_id, doc_id, n_prefix_terms) — one row per doc
    satisfying every clause; ``n_prefix_terms`` counts the distinct
    matching prefix terms in the doc.
    """
    must = (
        specs.select("query_id", F.explode("must").alias("term")).distinct()
    )
    n_must = must.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_must")
    )
    # one decode pass over the union of every query's must terms;
    # broadcast the tiny (query_id, term) dim back onto it
    mpost = (
        index.postings_for_query_terms(must.select("term").distinct())
        .select("term", "doc_id")
        .join(F.broadcast(must), "term")
    )
    hits = (
        mpost.groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("n_hit"))
        .join(F.broadcast(n_must), "query_id")
        .filter(F.col("n_hit") == F.col("n_must"))
        .select("query_id", "doc_id")
    )

    mnot = (
        specs.select("query_id", F.explode("must_not").alias("term"))
        .distinct()
    )
    npost = (
        index.postings_for_query_terms(mnot.select("term").distinct())
        .select("term", "doc_id")
        .join(F.broadcast(mnot), "term")
        .select("query_id", "doc_id")
        .distinct()
    )
    hits = hits.join(npost, ["query_id", "doc_id"], "left_anti")

    # prefix clause: collected list is ≤ one entry per QUERY —
    # bounded-tiny by contract, and it buys a pushed StartsWith scan
    pfx = specs.select("query_id", "prefix").filter(
        F.col("prefix").isNotNull() & (F.col("prefix") != "")
    )
    prefixes = sorted({r["prefix"] for r in pfx.select("prefix")
                       .distinct().collect()})
    ppost = (
        index.postings_for_term_prefixes(prefixes)
        .select("term", "doc_id")
        .join(
            F.broadcast(pfx),
            F.col("term").startswith(F.col("prefix")),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.count_distinct("term").alias("n_prefix_terms"))
    )
    return hits.join(ppost, ["query_id", "doc_id"]).select(
        "query_id", "doc_id",
        F.col("n_prefix_terms").cast("long").alias("n_prefix_terms"),
    )
