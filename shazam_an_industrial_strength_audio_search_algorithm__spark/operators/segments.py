"""Persisted, compressed, resumable segment index — engine v2.

This is the Spark-first replacement for the reference's index
persistence + consolidation machinery:

- per-doc ``.shash`` pickle files (``Hashing.py:45,52``) →
  ``doc_terms/`` parquet partitioned by term-bucket (written once,
  tokenize never re-runs);
- the single in-RAM ``LUT`` pickle (``Hashing.py:65``, loaded
  wholesale at ``Matching.py:62-67``) → ``segments/`` parquet of
  delta-gap+varint posting blocks with per-block ``max_tfnorm``
  (block-max WAND metadata) — read with partition pruning +
  predicate pushdown instead of a full load;
- the shell split / background jobs / ``Combine.py`` merge
  (``README.md:51,58-66``, ``Combine.py:55-62``) → per-bucket build
  jobs, each committing an atomic manifest; the combine step
  disappears because bucket outputs are disjoint by construction;
- mid-job checkpointing every 100 rows (``Matching.py:21,46-57``)
  → per-bucket manifests: an interrupted build resumes by building
  only buckets whose manifest is missing (the ``if utt in
  Unmatched_Dict: continue`` skip, ``Matching.py:96``, as an
  anti-join of work against committed state).

Scale design (the 100 TB story):

- ``bucket = pmod(xxhash64(term), n_buckets)`` — a term's postings
  all land in one bucket, so bucket-local df == global df, buckets
  build independently, and query terms prune to their buckets.
- Hot terms (stop-token-like landmark hashes; the reference has zero
  skew handling and eats it in RAM, SURVEY §4) are salted by
  **doc_id range** (top bits, sign-flipped so ranges follow signed
  order): per-(term, salt) groups are disjoint and internally
  ordered, so blocks come out globally doc_id-sorted without a
  second regroup — the salt splits the skewed group AND preserves
  merge order, which is what makes the two-phase aggregation correct.
- ``doc_len`` is inlined in the payload: scoring needs no norms join.
- One wide shuffle per bucket job (the groupBy); encoding runs in
  Arrow-batched ``applyInPandas`` with the numpy codec.
"""

from __future__ import annotations

import json
import os
import shutil
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.bm25 import (
    B,
    K1,
    idf_py,
    score_col,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
    decode_block,
    encode_block,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    build_doc_terms,
    with_doc_id,
)

BLOCK_SIZE = 128
SIGN_FLIP = -(2**63)  # XOR with the sign bit maps signed order to unsigned order

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("df", T.LongType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("block_seq", T.IntegerType()),
        T.StructField("doc_id_lo", T.LongType()),
        T.StructField("doc_id_hi", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("max_tfnorm", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _encode_groups(avgdl: float, block_size: int):
    """applyInPandas group encoder: one (term, df, salt) group of
    postings → block rows. Sorted by doc_id; ``max_tfnorm`` is the
    block-max BM25 tf-component (the term's idf multiplies in
    column-side: max_score = idf(df) * max_tfnorm)."""

    def fn(key, pdf: pd.DataFrame):
        term, df, salt = key[0], int(key[1]), int(key[2])
        order = np.argsort(pdf["doc_id"].to_numpy(), kind="stable")
        ids = pdf["doc_id"].to_numpy()[order].astype(np.int64)
        tfs = pdf["tf"].to_numpy()[order].astype(np.int64)
        dls = pdf["doc_len"].to_numpy()[order].astype(np.int64)
        tfnorm = tfs / (tfs + K1 * (1.0 - B + B * dls.astype(np.float64) / avgdl))
        rows = []
        for seq, s in enumerate(range(0, len(ids), block_size)):
            e = min(s + block_size, len(ids))
            rows.append(
                {
                    "term": term,
                    "df": df,
                    "salt": salt,
                    "block_seq": seq,
                    "doc_id_lo": int(ids[s]),
                    "doc_id_hi": int(ids[e - 1]),
                    "n_docs": int(e - s),
                    "max_tfnorm": float(tfnorm[s:e].max()),
                    "payload": encode_block(ids[s:e], tfs[s:e], dls[s:e]),
                }
            )
        return pd.DataFrame(rows)

    return fn


@dataclass
class BuildReport:
    built_buckets: list[int]
    skipped_buckets: list[int]
    phase_a_skipped: bool
    n_docs: int
    avgdl: float


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def build_segment_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_buckets: int = 8,
    hot_df: int = 2048,
    max_salt_bits: int = 6,
    block_size: int = BLOCK_SIZE,
    resume: bool = False,
    id_col: str = "doc_id",
    text_col: str = "content",
    buckets: list[int] | None = None,
) -> BuildReport:
    """Two-phase resumable build.

    Phase A (once): tokenize → doc_terms parquet partitioned by term
    bucket, + doc_lens + meta.json. Tokenization runs exactly once no
    matter how often phase B restarts. Phase B (per bucket,
    resumable): bucket-pruned read → window df → df-driven salt →
    ``applyInPandas`` block encode → segment parquet + atomic
    manifest.

    ``buckets`` limits phase B to a subset (tests use it to simulate
    an interrupted build; a real deployment passes None).
    """
    if id_col == "doc_id" and "doc_id" not in corpus.columns:
        corpus = with_doc_id(corpus)
    os.makedirs(f"{index_dir}/manifests", exist_ok=True)

    meta_path = f"{index_dir}/meta.json"
    phase_a_done = resume and os.path.exists(meta_path)
    if not phase_a_done:
        dt = build_doc_terms(corpus, id_col, text_col).withColumn(
            "bucket", F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int")
        )
        (
            dt.repartition(n_buckets, "bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{index_dir}/doc_terms")
        )
        dl = (
            spark.read.parquet(f"{index_dir}/doc_terms")
            .groupBy("doc_id")
            .agg(F.first("doc_len").alias("doc_len"))
        )
        dl.write.mode("overwrite").parquet(f"{index_dir}/doc_lens")
        row = (
            spark.read.parquet(f"{index_dir}/doc_lens")
            .agg(F.count(F.lit(1)).alias("n"), F.avg("doc_len").alias("avgdl"))
            .collect()[0]
        )
        _atomic_write_json(
            meta_path,
            {
                "n_docs": int(row["n"] or 0),
                "avgdl": float(row["avgdl"] or 0.0),
                "n_buckets": n_buckets,
                "block_size": block_size,
                "hot_df": hot_df,
                "format_version": 2,
            },
        )
    meta = json.load(open(meta_path))
    n_buckets = meta["n_buckets"]
    avgdl = meta["avgdl"]

    todo = list(range(n_buckets)) if buckets is None else list(buckets)
    built, skipped = [], []
    for b in todo:
        manifest_path = f"{index_dir}/manifests/bucket_{b}.json"
        if resume and os.path.exists(manifest_path):
            skipped.append(b)
            continue
        bucket_dt = (
            spark.read.parquet(f"{index_dir}/doc_terms")
            .filter(F.col("bucket") == b)
            .select("term", "doc_id", "tf", "doc_len")
        )
        # global df (bucket-local == global: bucket is a function of term)
        with_df = bucket_dt.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
        )
        # df-driven salt fan-out: hot terms split by doc_id range so
        # per-(term, salt) groups are disjoint AND ordered
        salted = (
            with_df.withColumn(
                "salt_bits",
                F.when(
                    F.col("df") > hot_df,
                    F.least(
                        F.ceil(F.log2(F.col("df") / F.lit(float(hot_df)))),
                        F.lit(max_salt_bits),
                    ),
                )
                .otherwise(F.lit(0))
                .cast("int"),
            )
            .withColumn("flipped", F.col("doc_id").bitwiseXOR(F.lit(SIGN_FLIP)))
            .withColumn(
                "salt",
                F.when(
                    F.col("salt_bits") > 0,
                    F.expr("CAST(shiftrightunsigned(flipped, 64 - salt_bits) AS INT)"),
                ).otherwise(F.lit(0)),
            )
            .drop("salt_bits", "flipped")
        )
        blocks = salted.groupBy("term", "df", "salt").applyInPandas(
            _encode_groups(avgdl, block_size), schema=BLOCK_SCHEMA
        )
        out = f"{index_dir}/segments/bucket={b}"
        blocks.write.mode("overwrite").parquet(out)
        stats = (
            spark.read.parquet(out)
            .agg(
                F.count(F.lit(1)).alias("n_blocks"),
                F.coalesce(F.sum("n_docs"), F.lit(0)).alias("n_postings"),
                F.countDistinct("term").alias("n_terms"),
            )
            .collect()[0]
        )
        _atomic_write_json(
            manifest_path,
            {
                "bucket": b,
                "n_blocks": int(stats["n_blocks"]),
                "n_postings": int(stats["n_postings"]),
                "n_terms": int(stats["n_terms"]),
                "n_docs_corpus": meta["n_docs"],
                "status": "committed",
            },
        )
        built.append(b)
    return BuildReport(
        built_buckets=built,
        skipped_buckets=skipped,
        phase_a_skipped=phase_a_done,
        n_docs=meta["n_docs"],
        avgdl=avgdl,
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("df", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("doc_len", T.LongType()),
    ]
)


def _decode_partition(it):
    cols = ["term", "df", "doc_id", "tf", "doc_len"]
    for pdf in it:
        outs = []
        for term, df, payload in zip(pdf["term"], pdf["df"], pdf["payload"]):
            ids, tfs, dls = decode_block(bytes(payload))
            outs.append(
                pd.DataFrame(
                    {"term": term, "df": int(df), "doc_id": ids,
                     "tf": tfs, "doc_len": dls}
                )
            )
        yield (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame(columns=cols)
        )


@dataclass
class SegmentIndex:
    """Reader over a committed segment index."""

    spark: SparkSession
    index_dir: str
    n_docs: int
    avgdl: float
    n_buckets: int

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str) -> "SegmentIndex":
        meta = json.load(open(f"{index_dir}/meta.json"))
        missing = [
            b
            for b in range(meta["n_buckets"])
            if not os.path.exists(f"{index_dir}/manifests/bucket_{b}.json")
        ]
        if missing:
            raise FileNotFoundError(
                f"index at {index_dir} incomplete: buckets {missing} lack "
                f"manifests — resume the build"
            )
        return cls(
            spark=spark,
            index_dir=index_dir,
            n_docs=meta["n_docs"],
            avgdl=meta["avgdl"],
            n_buckets=meta["n_buckets"],
        )

    def segments(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.index_dir}/segments")

    def doc_lens(self) -> DataFrame:
        return self.spark.read.parquet(f"{self.index_dir}/doc_lens")

    def blocks_for_terms(self, terms: list[str]) -> DataFrame:
        """Partition-pruned + predicate-pushed block scan: only the
        buckets/row-groups containing the given terms are read — the
        reference's 'touch only LUT entries for the query keys'
        access path (SURVEY §4), done by the storage layer."""
        buckets = resolve_buckets(self.spark, terms, self.n_buckets)
        return self.segments().filter(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        )

    def postings_for_terms(self, terms: list[str]) -> DataFrame:
        """Decoded postings (term, df, doc_id, tf, doc_len)."""
        return self.blocks_for_terms(terms).mapInPandas(
            _decode_partition, schema=DECODED_SCHEMA
        )

    def idf(self, df: int) -> float:
        return idf_py(df, self.n_docs)


def resolve_buckets(spark: SparkSession, terms: list[str], n_buckets: int) -> list[int]:
    """bucket ids of the given terms, via the same JVM xxhash64 the
    build used (one tiny local job — never guess the hash in Python)."""
    if not terms:
        return []
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    rows = df.select(
        F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("b")
    ).distinct().collect()
    return sorted(r["b"] for r in rows)


def segment_topk(
    index: SegmentIndex,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "query_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k over the persisted segment index.

    Plan: query terms (tiny, collected once, broadcast) ⋈ block scan
    (bucket partition-pruned, term predicate pushed to parquet) →
    ``mapInPandas`` varint decode → score (doc_len inline, no norms
    join) → groupBy(query, doc) sum → row_number ≤ k. Semantics
    identical to operators/topk.bm25_topk (tests/test_segments.py).
    """
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
        query_terms,
    )

    qt = query_terms(queries, id_col, text_col)
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    blocks = index.blocks_for_terms(terms)
    postings = blocks.mapInPandas(_decode_partition, schema=DECODED_SCHEMA)
    scored = (
        postings.join(F.broadcast(qt), "term")
        .withColumn(
            "term_score",
            score_col(F.col("tf"), F.col("df"), F.col("doc_len"),
                      index.n_docs, index.avgdl),
        )
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("term_score").alias("score"),
            F.count(F.lit(1)).alias("matched_terms"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score", "matched_terms")
    )


def drop_index(index_dir: str) -> None:
    shutil.rmtree(index_dir, ignore_errors=True)
