"""Driver-facing query battery: every operator exposed as a
(spark, sf_dir) -> DataFrame callable plus a DuckDB oracle SQL string.

Conventions that make the driver's order-insensitive value-hash stable
across Spark and DuckDB:
- every aggregate/computed column aliased identically in both dialects;
- floating scores are exposed as integer micro-units
  (``sum(round(contrib * 1e6))`` per term) — integer sums are
  order-independent, so partition order / engine summation order can't
  flip the hash;
- counts cast to long/BIGINT on both sides;
- top-k uses the deterministic tie-break (score DESC, doc_id ASC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.bm25 import (
    B,
    K1,
    score_col,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.tokenize import (
    DUCKDB_TOKENS_SQL,
    tokens_col,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    InvertedIndex,
)

# ---------------------------------------------------------------------------
# fixed flagship query set (the sandbox analog of the reference's
# data/query_short + data/query_long + Nil-class pop clips)
# ---------------------------------------------------------------------------
FLAGSHIP_QUERIES: list[tuple[str, str]] = [
    ("fq0", "hash join merge sort window spark"),
    ("fq1", "customer order line value table"),
    ("fq2", "vector scan filter group agg stream"),
    ("fq3", "big slow batch dup column row"),
    ("fq4", "zzznil qqqoov wwwabsent tokens"),  # Nil class
]
TOPK_K = 10


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def docs_index(spark: SparkSession, sf_dir: str) -> InvertedIndex:
    """Build the v1 index over the driver's ``documents`` table
    (doc_id, text, lang, source, n_chars)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return InvertedIndex.build(docs, id_col="doc_id", text_col="text")


def queries_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(FLAGSHIP_QUERIES, "query_id string, text string")


# shared DuckDB CTE prefix: tokenize documents → tf / dl / df / stats
_D_TOKS = DUCKDB_TOKENS_SQL.format(col="text")
_Q_VALUES = ", ".join(f"('{qid}', '{txt}')" for qid, txt in FLAGSHIP_QUERIES)

DUCKDB_INDEX_CTES = f"""
  raw AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
  toks AS (SELECT doc_id, unnest(toks) AS term FROM raw),
  tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
         FROM toks GROUP BY doc_id, term),
  dl AS (SELECT doc_id, count(*)::BIGINT AS doc_len FROM toks GROUP BY doc_id),
  stats AS (SELECT count(*)::BIGINT AS n_docs, avg(doc_len) AS avgdl FROM dl),
  df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
  qv(query_id, qtext) AS (VALUES {_Q_VALUES}),
  qt AS (SELECT DISTINCT query_id,
                unnest({DUCKDB_TOKENS_SQL.format(col="qtext")}) AS term
         FROM qv)
"""

_SCORE_EXPR = (
    f"ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5)) * "
    f"(tf.tf / (tf.tf + {K1} * (1.0 - {B} + {B} * dl.doc_len / stats.avgdl)))"
)


# ---------------------------------------------------------------------------
# fulltext battery
# ---------------------------------------------------------------------------
def q_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term → document frequency, top 100 (df DESC, term ASC) — the
    index's LUT cardinality view (↔ addLUT, SURVEY §2.4 A2)."""
    idx = docs_index(spark, sf_dir)
    return (
        idx.term_stats.select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(100)
    )


Q_TERM_DF_SQL = f"""
WITH {DUCKDB_INDEX_CTES}
SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT 100
"""


def q_doc_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → token count (BM25 length-normalization input;
    ↔ the reference's per-doc ``max_time``, _Shazam_.py:278)."""
    idx = docs_index(spark, sf_dir)
    return (
        idx.doc_terms.groupBy("doc_id")
        .agg(F.first("doc_len").cast("long").alias("doc_len"))
    )


Q_DOC_LEN_SQL = f"""
WITH {DUCKDB_INDEX_CTES}
SELECT doc_id, doc_len FROM dl
"""


def q_term_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, term, tf) for a fixed probe-term set — posting-list
    content check (↔ the per-doc shash dict, _Shazam_.py:269-276)."""
    idx = docs_index(spark, sf_dir)
    probes = ["hash", "join", "spark", "window", "customer"]
    return (
        idx.doc_terms.filter(F.col("term").isin(probes))
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"))
    )


Q_TERM_TF_SQL = f"""
WITH {DUCKDB_INDEX_CTES}
SELECT doc_id, term, tf FROM tf
WHERE term IN ('hash', 'join', 'spark', 'window', 'customer')
"""


def q_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate generation: per (query, doc) count of distinct matched
    query terms (↔ searchLUT_v2's Counter, _Shazam_.py:494-506)."""
    idx = docs_index(spark, sf_dir)
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
        query_terms,
    )

    qt = query_terms(queries_df(spark))
    return (
        idx.doc_terms.join(F.broadcast(qt), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("matched_terms"))
    )


Q_CANDIDATES_SQL = f"""
WITH {DUCKDB_INDEX_CTES}
SELECT qt.query_id, tf.doc_id, count(*)::BIGINT AS matched_terms
FROM qt JOIN tf USING (term)
GROUP BY qt.query_id, tf.doc_id
"""


def _bm25_micro_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, doc_id, score_micro, matched_terms) — BM25 with
    per-term contributions rounded to integer micro-units before the
    sum (order-independent ⇒ hash-stable)."""
    idx = docs_index(spark, sf_dir)
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
        query_terms,
    )

    qt = query_terms(queries_df(spark))
    qt_stats = idx.term_stats.join(F.broadcast(qt.select("term").distinct()), "term")
    matched = idx.doc_terms.join(F.broadcast(qt), "term")
    scored = matched.join(F.broadcast(qt_stats), "term").withColumn(
        "contrib_micro",
        F.round(
            score_col(F.col("tf"), F.col("df"), F.col("doc_len"),
                      idx.n_docs, idx.avgdl) * F.lit(1_000_000.0)
        ).cast("long"),
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.sum("contrib_micro").alias("score_micro"),
        F.count(F.lit(1)).cast("long").alias("matched_terms"),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: BM25 top-k per query, deterministic tie-break
    (score DESC, doc_id ASC) — the whole reference query pipeline
    (SURVEY §3.2) as one plan."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    return (
        _bm25_micro_scores(spark, sf_dir)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK_K)
        .select("query_id", "rank", "doc_id", "score_micro", "matched_terms")
    )


_BM25_MICRO_CTES = f"""
{DUCKDB_INDEX_CTES},
  scored AS (
    SELECT qt.query_id, tf.doc_id,
           sum(CAST(round(({_SCORE_EXPR}) * 1000000.0) AS BIGINT)) AS score_micro,
           count(*)::BIGINT AS matched_terms
    FROM qt
    JOIN tf USING (term)
    JOIN df USING (term)
    JOIN dl ON tf.doc_id = dl.doc_id
    CROSS JOIN stats
    GROUP BY qt.query_id, tf.doc_id
  )
"""

Q_BM25_TOPK_SQL = f"""
WITH {_BM25_MICRO_CTES},
  ranked AS (
    SELECT query_id, doc_id, score_micro, matched_terms,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY score_micro DESC, doc_id ASC
           )::BIGINT AS rank
    FROM scored
  )
SELECT query_id, rank, doc_id, score_micro, matched_terms
FROM ranked WHERE rank <= {TOPK_K}
"""


def q_match_or_nil(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's decision row per query: matched doc above
    threshold or NULL (Nil), + second-best (Matching.py:120-148)."""
    threshold_micro = 2_000_000  # score > 2.0
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc()
    )
    ranked = _bm25_micro_scores(spark, sf_dir).withColumn(
        "rank", F.row_number().over(w)
    )
    agg = ranked.groupBy("query_id").agg(
        F.max(F.when(F.col("rank") == 1, F.col("doc_id"))).alias("top1_doc"),
        F.max(F.when(F.col("rank") == 1, F.col("score_micro"))).alias("top1_score"),
        F.max(F.when(F.col("rank") == 2, F.col("doc_id"))).alias("second_doc_id"),
    )
    qs = queries_df(spark).select("query_id")
    is_match = F.col("top1_score") > F.lit(threshold_micro)
    return qs.join(agg, "query_id", "left").select(
        "query_id",
        F.when(is_match, F.col("top1_doc")).alias("matched_doc_id"),
        F.when(is_match, F.col("top1_score")).alias("matched_score_micro"),
        F.when(is_match, F.col("second_doc_id"))
        .otherwise(F.col("top1_doc")).alias("second_doc_id"),
    )


Q_MATCH_OR_NIL_SQL = f"""
WITH {_BM25_MICRO_CTES},
  ranked AS (
    SELECT query_id, doc_id, score_micro,
           row_number() OVER (
             PARTITION BY query_id
             ORDER BY score_micro DESC, doc_id ASC
           ) AS rank
    FROM scored
  ),
  agg AS (
    SELECT query_id,
           max(CASE WHEN rank = 1 THEN doc_id END) AS top1_doc,
           max(CASE WHEN rank = 1 THEN score_micro END) AS top1_score,
           max(CASE WHEN rank = 2 THEN doc_id END) AS second_doc
    FROM ranked GROUP BY query_id
  )
SELECT qv.query_id,
       CASE WHEN top1_score > 2000000 THEN top1_doc END AS matched_doc_id,
       CASE WHEN top1_score > 2000000 THEN top1_score END AS matched_score_micro,
       CASE WHEN top1_score > 2000000 THEN second_doc ELSE top1_doc END
         AS second_doc_id
FROM qv LEFT JOIN agg USING (query_id)
"""


def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional verification: docs where 'hash' is immediately
    followed by 'join' — the engine analog of the reference's
    time-offset-consistency vote (Δt alignment, _Shazam_.py:309-351):
    both check that matched terms occur at consistent relative
    positions, not just that they co-occur."""
    idx = docs_index(spark, sf_dir)
    a = idx.doc_terms.filter(F.col("term") == "hash").select(
        "doc_id", F.explode("positions").alias("pa")
    )
    b = idx.doc_terms.filter(F.col("term") == "join").select(
        F.col("doc_id").alias("doc_id_b"), F.explode("positions").alias("pb")
    )
    return (
        a.join(b, (a.doc_id == b.doc_id_b) & (b.pb == a.pa + 1))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )


Q_PHRASE_MATCH_SQL = f"""
WITH
  raw AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
  pos AS (SELECT doc_id, unnest(toks) AS term,
                 unnest(range(len(toks))) AS pos
          FROM raw)
SELECT a.doc_id, count(*)::BIGINT AS n_occurrences
FROM pos a JOIN pos b
  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'hash' AND b.term = 'join'
GROUP BY a.doc_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------
QUERIES: dict[str, callable] = {
    "term_df": q_term_df,
    "doc_len": q_doc_len,
    "term_tf": q_term_tf,
    "candidates": q_candidates,
    "bm25_topk": q_bm25_topk,
    "match_or_nil": q_match_or_nil,
    "phrase_match": q_phrase_match,
}

ORACLE_SQL: dict[str, str] = {
    "term_df": Q_TERM_DF_SQL,
    "doc_len": Q_DOC_LEN_SQL,
    "term_tf": Q_TERM_TF_SQL,
    "candidates": Q_CANDIDATES_SQL,
    "bm25_topk": Q_BM25_TOPK_SQL,
    "match_or_nil": Q_MATCH_OR_NIL_SQL,
    "phrase_match": Q_PHRASE_MATCH_SQL,
}
