"""Deduplication operators for a training-data pipeline: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale shapes (the part that must survive 100×):

- exact: one hash-groupBy on a 64-char digest — the classic
  map-side-combine agg; no content ever shuffles, only digests.
- n-gram Jaccard: shingle explode → self-equi-join on shingle →
  pair-count agg. Quadratic in the worst case; at scale you gate it
  behind LSH candidate generation (below) and only verify candidates.
- MinHash: signatures computed in one narrow pass (numpy pandas UDF,
  vectorized across perms), LSH bands hashed JVM-side; the only wide
  op is the band-bucket self-join — banding IS the blocking strategy,
  and band buckets are naturally balanced because signatures are
  near-uniform.
- SimHash: 64-bit signature from xxhash64(term) sign bits weighted by
  tf, chunked into 4×16-bit bands for candidate pairing (hamming ≤ 3
  within-band collision guarantee by pigeonhole).
- embedding near-dup: normalized vectors, cosine = dot; LSH sign
  buckets (seeded hyperplanes) for blocking, exact re-verify.

Determinism: every hash is Spark's xxhash64/Murmur3 or a seeded
affine transform of it — never Python ``hash()`` (the reference's
unsalted-``hash()`` determinism contract, ``_Shazam_.py:258-261``,
made explicit).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.tokenize import (
    tokens_col,
)

# MinHash parameters: affine permutations h_i(x) = (a_i*x + b_i) mod p
# over a Mersenne prime, seeded — public textbook construction.
MINHASH_PRIME = (1 << 61) - 1
DEFAULT_NUM_PERM = 64
DEFAULT_BANDS = 16


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_dup_groups(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Groups of byte-identical docs: (content_sha, group_size,
    canonical_id=min id, member ids sorted). Only digests shuffle."""
    return (
        df.select(F.col(id_col).alias("doc_id"),
                  F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(
            F.count(F.lit(1)).cast("long").alias("group_size"),
            F.min("doc_id").alias("canonical_id"),
            F.sort_array(F.collect_list("doc_id")).alias("member_ids"),
        )
        .filter(F.col("group_size") > 1)
    )


def dedup_exact(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Keep one representative (min id) per identical-content group."""
    w = Window.partitionBy(F.sha2(F.col(text_col), 256)).orderBy(
        F.col(id_col).asc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise over shingles)
# ---------------------------------------------------------------------------
def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc: (doc_id, shingle)."""
    toks = tokens_col(F.col(text_col))
    grams = F.array_distinct(
        F.filter(
            F.transform(
                toks,
                lambda t, i: F.when(
                    i + n <= F.size(toks),
                    F.concat_ws(" ", *[F.element_at(toks, i + j + 1)
                                       for j in range(n)]),
                ),
            ),
            lambda g: g.isNotNull(),
        )
    )
    return df.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("shingle")
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        threshold: float = 0.8) -> DataFrame:
    """Exact Jaccard ≥ threshold pairs (doc_a < doc_b) over n-gram
    shingle sets, plus the intersection/union sizes (integers — the
    driver-hash-stable form; jaccard_micro derived)."""
    sh = shingles(df, id_col, text_col, n)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_shingles").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_shingles").alias("size_b"))
    out = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard_micro",
            F.round(
                F.col("n_common") * F.lit(1_000_000.0)
                / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
            ).cast("long"),
        )
        .filter(F.col("jaccard_micro") >= int(threshold * 1_000_000))
    )
    return out.select("doc_a", "doc_b", "n_common", "jaccard_micro")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MINHASH_PRIME, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MINHASH_PRIME, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", n: int = 3,
                       num_perm: int = DEFAULT_NUM_PERM,
                       seed: int = 7) -> DataFrame:
    """(doc_id, sig: array<long>[num_perm]) — shingles hashed JVM-side
    (xxhash64), permutations applied vectorized in one pandas UDF."""
    a, b = _minhash_params(num_perm, seed)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_udf(hashes: pd.Series) -> pd.Series:
        def one(hs):
            if hs is None or len(hs) == 0:
                return None
            x = np.asarray(hs, dtype=np.int64).astype(np.uint64)[:, None]
            # (n_shingles, num_perm) affine transform mod prime
            vals = (x * a[None, :] + b[None, :]) % np.uint64(MINHASH_PRIME)
            return vals.min(axis=0).astype(np.int64)

        return hashes.map(one)

    sh = shingles(df, id_col, text_col, n)
    hashed = (
        sh.select("doc_id", F.xxhash64("shingle").alias("h"))
        .groupBy("doc_id")
        .agg(F.collect_list("h").alias("hs"))
    )
    return hashed.select(
        "doc_id", sig_udf(F.col("hs")).alias("sig")
    ).filter(F.col("sig").isNotNull())


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n: int = 3,
                      num_perm: int = DEFAULT_NUM_PERM,
                      bands: int = DEFAULT_BANDS,
                      threshold: float = 0.8, seed: int = 7,
                      verify: bool = True) -> DataFrame:
    """Near-dup candidate pairs via banded LSH over MinHash
    signatures; optionally verified with exact shingle Jaccard
    (the scale path: LSH blocks, exact check only on candidates).

    Output: (doc_a, doc_b, est_jaccard_micro[, jaccard_micro])."""
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(df, id_col, text_col, n, num_perm, seed)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(*[
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[F.element_at("sig", i * rows_per_band + j + 1)
                          for j in range(rows_per_band)],
                    )
                )
                for i in range(bands)
            ])
        ).alias("band", "band_hash"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"))
    est = (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "est_jaccard_micro",
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                ) * F.lit(1_000_000.0) / F.lit(num_perm)
            ).cast("long"),
        )
        .select("doc_a", "doc_b", "est_jaccard_micro")
    )
    if not verify:
        return est
    exact = ngram_jaccard_pairs(df, id_col, text_col, n, threshold=0.0)
    return (
        est.join(exact, ["doc_a", "doc_b"], "left")
        .withColumn("jaccard_micro", F.coalesce("jaccard_micro", F.lit(0)))
        .filter(F.col("jaccard_micro") >= int(threshold * 1_000_000))
        .select("doc_a", "doc_b", "est_jaccard_micro", "jaccard_micro")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from tf-weighted term-hash sign bits.
    Term hashes are JVM xxhash64; the bit fold is a pandas UDF."""

    @F.pandas_udf(T.LongType())
    def fold(hashes: pd.Series, tfs: pd.Series) -> pd.Series:
        def one(args):
            hs, ws = args
            if hs is None or len(hs) == 0:
                return 0
            h = np.asarray(hs, dtype=np.int64).astype(np.uint64)
            w = np.asarray(ws, dtype=np.float64)
            bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.float64)
            acc = ((bits * 2 - 1) * w[:, None]).sum(axis=0)
            sig = np.uint64(0)
            for i in np.flatnonzero(acc > 0):
                sig |= np.uint64(1) << np.uint64(i)
            return int(sig.astype(np.int64).view(np.int64))

        return pd.Series(map(one, zip(hashes, tfs)))

    toks = tokens_col(F.col(text_col))
    terms = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.xxhash64("term")).alias("hs"),
            F.collect_list("tf").alias("ws"),
        )
    )
    return terms.select(
        "doc_id", fold(F.col("hs"), F.col("ws")).alias("simhash")
    )


def simhash_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, blocked by
    16-bit chunk equality (pigeonhole: any pair within hamming 3
    shares at least one of 4 chunks)."""
    sigs = simhash_signatures(df, id_col, text_col)
    chunked = sigs.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col("simhash"), 16 * i)
                .bitwiseAND(F.lit(0xFFFF)).cast("int")
                for i in range(4)
            ])
        ).alias("chunk_idx", "chunk"),
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------
def embedding_neardup_pairs(emb: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            threshold: float = 0.95) -> DataFrame:
    """Exact cosine ≥ threshold pairs. Brute-force path (all-pairs
    within norm-compatible candidates); the blocking variant lives in
    operators/similarity.py (sign-LSH buckets + verify)."""
    v = emb.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).withColumn(
        "norm",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)),
    )
    a, b = v.alias("a"), v.alias("b")
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .withColumn(
            "dot",
            F.aggregate(
                F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )
        .withColumn(
            "cosine_micro",
            F.round(
                F.col("dot") * F.lit(1_000_000.0)
                / (F.col("a.norm") * F.col("b.norm"))
            ).cast("long"),
        )
        .filter(F.col("cosine_micro") >= int(threshold * 1_000_000))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine_micro",
        )
    )
