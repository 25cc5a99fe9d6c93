"""Persisted, compressed, resumable, snapshot-versioned segment index.

This is the Spark-first replacement for the reference's index
persistence + consolidation machinery:

- per-doc ``.shash`` pickle files (``Hashing.py:45,52``) →
  ``doc_terms`` parquet partitioned by term-bucket (tokenize runs
  once, ever);
- the single in-RAM ``LUT`` pickle (``Hashing.py:65``, loaded
  wholesale at ``Matching.py:62-67``) → posting-block parquet
  (delta-gap+varint payloads with per-block max_tf/min_dl/max_tfnorm
  = block-max WAND metadata), read with partition pruning + predicate
  pushdown instead of a full RAM load;
- the shell split / background jobs / ``Combine.py`` merge
  (``README.md:51,58-66``, ``Combine.py:55-62``) → per-bucket build
  jobs committing atomic manifests; the combine step disappears
  because bucket outputs are disjoint by construction;
- mid-job checkpointing (``Matching.py:21,46-57``) → per-bucket
  manifests: an interrupted build resumes by building only buckets
  whose manifest is missing (the ``if utt in Unmatched_Dict:
  continue`` skip, ``Matching.py:96``);
- backup-then-rewrite on update (``Hashing_update.py:102-108``) →
  real snapshots: a ``CURRENT`` pointer + immutable per-snapshot
  bucket→path maps; updates rewrite only affected buckets and inherit
  the rest; ``restore()`` is a pointer flip (SURVEY §3.3).

Layout::

    index_dir/
      CURRENT                     # text file: current snapshot version
      snapshots/v<N>.json         # stats + {bucket: {doc_terms, segments}}
      data/dt_<gen>/bucket=K/     # doc_terms parquet for generation <gen>
      data/seg_<gen>/bucket=K/    # posting blocks for generation <gen>
      data/dl_<gen>/              # doc_lens parquet
      manifests/<gen>/bucket_K.json

Scale design (the 100 TB story):

- ``bucket = pmod(xxhash64(term), n_buckets)`` — a term's postings
  all land in one bucket, so bucket-local df == global df, buckets
  build independently and in parallel, and query terms prune to
  their buckets.
- Hot terms (stop-token-like landmark hashes; the reference has zero
  skew handling and eats it in RAM, SURVEY §4) are salted by
  **doc_id range** (top bits, sign-flipped so ranges follow signed
  order): per-(term, salt) groups are disjoint and internally
  ordered, so blocks come out globally doc_id-sorted without a
  second regroup — the salt splits the skewed group AND preserves
  merge order.
- ``doc_len`` is inlined in the payload: scoring needs no norms join.
- Block bounds are stored as raw ints (max_tf, min_dl) so WAND upper
  bounds stay SAFE when later snapshots change n_docs/avgdl
  (tfnorm is increasing in tf, decreasing in dl — the bound is
  recomputed from the current avgdl at query time).
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
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
    with_doc_id,
)
from shazam_an_industrial_strength_audio_search_algorithm__spark.session import (
    local_rows_df,
)

BLOCK_SIZE = 128

# ---------------------------------------------------------------------------
# data-aware layout policy (round-5: verdict item 2)
# ---------------------------------------------------------------------------
# The round-4 serving campaign measured that per-bucket posting volume
# is what drives tuned WAND latency (1.78×/doubling when buckets are
# fixed), and that bucket count, block size and query group count must
# scale TOGETHER (BENCH/BASELINE.md §scale-stress round 4: 4M docs at
# 128 buckets + 256-block + 128 groups = 962 ms/q vs 1892 default).
# These policies encode that lesson as the build-time default:
# DOCS_PER_BUCKET reproduces the measured optimum (4M → 128 buckets,
# 2M → 64, 1M → 32) and holds per-bucket volume ~constant as the
# corpus grows; wand_topk's group default (max(shuffle_partitions,
# n_buckets)) then scales the query side automatically.
DOCS_PER_BUCKET = 32_768
MIN_BUCKETS, MAX_BUCKETS = 8, 4096
BIG_CORPUS_DOCS = 1_000_000  # block_size 128 → 256 crossover


def auto_n_buckets(n_docs: int) -> int:
    """Bucket count for a corpus of ``n_docs``: next power of two of
    n_docs / DOCS_PER_BUCKET, clamped to [MIN_BUCKETS, MAX_BUCKETS].
    Power-of-two keeps re-bucketing compactions cheap to reason about
    and the clamp keeps tiny corpora at the well-tested default."""
    import math

    need = max(1, math.ceil(int(n_docs) / DOCS_PER_BUCKET))
    return max(MIN_BUCKETS, min(MAX_BUCKETS, 1 << (need - 1).bit_length()))


def auto_block_size(n_docs: int) -> int:
    """Posting-block length policy: 128 below 1M docs (decode
    granularity favors pruning), 256 at/above (fewer block rows
    through the encode shuffle and the probe scan — the measured
    large-corpus knob from the round-4 study)."""
    return 256 if int(n_docs) >= BIG_CORPUS_DOCS else BLOCK_SIZE
SIGN_FLIP = -(2**63)  # XOR with the sign bit maps signed order to unsigned order

BLOCK_CORE_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("block_seq", T.IntegerType()),
        T.StructField("doc_id_lo", T.LongType()),
        T.StructField("doc_id_hi", T.LongType()),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("max_tf", T.LongType()),
        T.StructField("min_dl", T.LongType()),
        T.StructField("max_tfnorm", T.DoubleType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DT_COLS = ["term", "doc_id", "tf", "positions", "doc_len"]


# ---------------------------------------------------------------------------
# low-level helpers
# ---------------------------------------------------------------------------
def bucket_col(term_col, n_buckets: int):
    return F.pmod(F.xxhash64(term_col), F.lit(n_buckets)).cast("int")


def resolve_buckets(spark: SparkSession, terms: list[str], n_buckets: int) -> list[int]:
    """Bucket ids for the given terms via the same JVM xxhash64 the
    build used (one tiny local job — never re-guess the hash in
    Python)."""
    if not terms:
        return []
    df = local_rows_df(spark, [(t,) for t in terms], "term string")
    rows = (
        df.select(bucket_col(F.col("term"), n_buckets).alias("b"))
        .distinct()
        .collect()
    )
    return sorted(r["b"] for r in rows)


def _encode_partition(avgdl: float, block_size: int,
                      store_positions: bool = False):
    """mapInPandas PARTITION encoder: rows arrive hash-partitioned by
    (bucket, term, salt) and sorted within the partition by
    (term, salt, doc_id); every posting group in the partition is
    block-split and varint-encoded in ONE vectorized pass.

    Why not applyInPandas-per-group: at bench scale the vocabulary is
    ~25 k groups → 25 k Python callbacks + 80 k per-block
    ``encode_block`` calls on ≤128-element arrays, where per-call
    overhead dwarfs the work (measured ~11 s of a 17 s phase B).
    Here block boundaries, per-block stats (reduceat) and the whole
    value stream (scatter + one LEB128 pass + byte-slicing at block
    boundaries) are numpy over the full partition — the same output
    bytes, two orders of magnitude fewer Python transitions.

    ``df`` joins in after (block rows are tiny compared to postings —
    attaching df via a block-side join beats a full-row window over
    the postings). With ``store_positions`` the per-doc occurrence
    offsets ride in a trailing delta-varint section of each payload.
    """
    from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.codec import (
        varint_encode_with_ends,
        zigzag_encode,
    )

    def fn(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        R = len(pdf)
        ids = pdf["doc_id"].to_numpy(np.int64)
        tf = pdf["tf"].to_numpy(np.int64)
        dl = pdf["doc_len"].to_numpy(np.int64)
        salt = pdf["salt"].to_numpy(np.int64)
        # group change where (term, salt) changes (rows are sorted)
        term_codes, _ = pd.factorize(pdf["term"], sort=False)
        new_group = np.empty(R, dtype=bool)
        new_group[0] = True
        new_group[1:] = (np.diff(term_codes) != 0) | (np.diff(salt) != 0)
        gstart = np.flatnonzero(new_group)
        gsize = np.diff(np.append(gstart, R))
        # within-group ordinal → block boundaries every block_size rows
        ordinal = np.arange(R) - np.repeat(gstart, gsize)
        is_bstart = new_group | (ordinal % block_size == 0)
        bstart = np.flatnonzero(is_bstart)
        n = np.diff(np.append(bstart, R))  # rows per block
        nB = bstart.size

        # strictly-ascending doc_ids within each group (duplicate or
        # unsorted input is a build bug — fail loudly, like encode_block)
        not_start = ~new_group
        if not_start.any() and not (ids[not_start] > ids[np.flatnonzero(not_start) - 1]).all():
            raise ValueError("doc_ids must be strictly ascending per group")

        # per-block stats via reduceat (contiguous blocks)
        tfnorm = tf / (tf + K1 * (1.0 - B + B * dl.astype(np.float64) / avgdl))
        out = {
            "bucket": pdf["bucket"].to_numpy(np.int32)[bstart],
            "term": pdf["term"].to_numpy()[bstart],
            "salt": salt[bstart].astype(np.int32),
            "block_seq": (ordinal[bstart] // block_size).astype(np.int32),
            "doc_id_lo": ids[bstart],
            "doc_id_hi": ids[bstart + n - 1],
            "n_docs": n.astype(np.int32),
            "max_tf": np.maximum.reduceat(tf, bstart),
            "min_dl": np.minimum.reduceat(dl, bstart),
            "max_tfnorm": np.maximum.reduceat(tfnorm, bstart),
        }

        # ---- assemble the value stream for ALL blocks at once -------
        # per-block layout: n | zz(first) gaps... | tfs... | dls...
        #                   [| pos-deltas (Σtf of the block)]
        prev = np.empty(R, dtype=np.uint64)
        u = ids.astype(np.uint64)
        prev[1:] = u[:-1]
        rowval = np.where(is_bstart, zigzag_encode(ids), u - prev)
        blk_len = 1 + 3 * n
        if store_positions:
            flat_parts = pdf["positions"].to_numpy()
            flat = (
                np.concatenate([np.asarray(p, dtype=np.int64)
                                for p in flat_parts])
                if R else np.zeros(0, dtype=np.int64)
            )
            if flat.size != int(tf.sum()):
                raise ValueError("positions length != sum(tf)")
            npos_b = np.add.reduceat(tf, bstart)
            blk_len = blk_len + npos_b
        off = np.concatenate(([0], np.cumsum(blk_len)[:-1]))
        total = int(np.cumsum(blk_len)[-1]) if nB else 0
        vals = np.zeros(total, dtype=np.uint64)
        vals[off] = n.astype(np.uint64)
        off_rep = np.repeat(off, n)
        n_rep = np.repeat(n, n)
        j = np.arange(R) - np.repeat(bstart, n)
        vals[off_rep + 1 + j] = rowval
        vals[off_rep + 1 + n_rep + j] = tf.astype(np.uint64)
        vals[off_rep + 1 + 2 * n_rep + j] = dl.astype(np.uint64)
        if store_positions:
            # per-row first offset absolute, then in-row deltas
            pprev = np.empty(flat.size, dtype=np.int64)
            pprev[1:] = flat[:-1]
            row_pstart = np.zeros(flat.size, dtype=bool)
            row_pstart[np.cumsum(tf) - tf] = True
            pdeltas = np.where(row_pstart, flat, flat - pprev)
            if (pdeltas < 0).any():
                raise ValueError("positions must ascend within each doc")
            # scatter target: block pos-section + within-block prefix
            tf_cum = np.cumsum(tf) - tf  # global prefix of positions
            blk_pos_base = off_rep + 1 + 3 * n_rep  # per ROW
            within_blk = tf_cum - np.repeat(tf_cum[bstart], n)
            row_target = blk_pos_base + within_blk  # per ROW start
            pos_target = np.repeat(row_target, tf) + (
                np.arange(flat.size) - np.repeat(tf_cum, tf)
            )
            vals[pos_target] = pdeltas.astype(np.uint64)

        buf, ends = varint_encode_with_ends(vals)
        blk_val_end = np.cumsum(blk_len)
        byte_end = ends[blk_val_end - 1] if nB else np.zeros(0, np.int64)
        byte_start = np.concatenate(([0], byte_end[:-1]))
        out["payload"] = [
            buf[int(s):int(e)] for s, e in zip(byte_start, byte_end)
        ]
        yield pd.DataFrame(out)

    return fn


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _read_current(index_dir: str) -> int:
    with open(f"{index_dir}/CURRENT") as f:
        return int(f.read().strip())


def _snapshot_versions(index_dir: str) -> list[int]:
    sdir = f"{index_dir}/snapshots"
    if not os.path.isdir(sdir):
        return []
    return sorted(
        int(n[1:-5]) for n in os.listdir(sdir)
        if n.startswith("v") and n.endswith(".json")
    )


def _next_commit_version(index_dir: str) -> int:
    vs = [0] + _snapshot_versions(index_dir)
    if os.path.exists(f"{index_dir}/CURRENT"):
        vs.append(_read_current(index_dir))
    return max(vs) + 1


def _next_build_gen(index_dir: str) -> str:
    """Name for a fresh REBUILD generation: past any committed
    snapshot version AND past any crashed rebuild's staged dirs, so a
    new rebuild never collides with either."""
    seqs = [1] + _snapshot_versions(index_dir)
    mdir = f"{index_dir}/manifests"
    if os.path.isdir(mdir):
        seqs += [
            int(g[2:]) for g in os.listdir(mdir)
            if g.startswith("rb") and g[2:].isdigit()
        ]
    if os.path.exists(f"{index_dir}/CURRENT"):
        seqs.append(_read_current(index_dir))
    return f"rb{max(seqs) + 1}"


def _resumable_build_gen(index_dir: str) -> str | None:
    """The newest build generation with staged params (phase A done or
    in progress): an interrupted rebuild ``rbN`` wins over the initial
    ``init``; None when nothing is staged."""
    mdir = f"{index_dir}/manifests"
    if not os.path.isdir(mdir):
        return None
    rbs = sorted(
        (int(g[2:]) for g in os.listdir(mdir)
         if g.startswith("rb") and g[2:].isdigit()
         and os.path.exists(f"{mdir}/{g}/params.json")),
        reverse=True,
    )
    if rbs:
        return f"rb{rbs[0]}"
    if os.path.exists(f"{mdir}/init/params.json"):
        return "init"
    return None


def _committed_version_of_gen(index_dir: str, gen: str) -> int | None:
    """Snapshot version (if any) whose base buckets reference this
    generation's data — the idempotent-re-run guard's anchor."""
    for v in reversed(_snapshot_versions(index_dir)):
        try:
            snap = json.load(open(f"{index_dir}/snapshots/v{v}.json"))
        except (OSError, ValueError):
            continue
        if snap.get("gen") == gen or any(
            str(b.get("doc_terms", "")).startswith(f"data/dt_{gen}/")
            for b in snap.get("buckets", {}).values()
        ):
            return v
    return None


def _write_current(index_dir: str, version: int) -> None:
    tmp = f"{index_dir}/CURRENT.tmp"
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, f"{index_dir}/CURRENT")


def read_snapshot(index_dir: str, version: int | None = None) -> dict:
    if version is None:
        version = _read_current(index_dir)
    snap = json.load(open(f"{index_dir}/snapshots/v{version}.json"))
    snap["version"] = version
    return snap


def build_buckets_batch(
    spark: SparkSession,
    index_dir: str,
    gen: str,
    buckets: list[int],
    dt_path: str,
    avgdl: float,
    n_docs: int,
    hot_df: int,
    max_salt_bits: int,
    block_size: int,
    store_positions: bool = False,
) -> None:
    """Build segments for a batch of buckets in ONE Spark job, then
    commit each bucket's manifest (idempotent: dynamic partition
    overwrite + manifest-last).

    Plan: (1) count-only df agg per (bucket, term) — map-side partial
    aggregation, only counts shuffle; (2) hot terms (df > hot_df,
    a tiny set by Zipf) broadcast back onto the postings to assign
    doc-id-range salts; (3) the one heavy shuffle:
    groupBy(bucket, term, salt) → applyInPandas block encode;
    (4) df attaches to the BLOCK rows (≈ postings/block_size rows —
    far cheaper than windowing df over raw postings); (5) write
    partitionBy(bucket), overwriting only the touched partitions.
    """
    if not buckets:
        return
    cols = ["bucket", "term", "doc_id", "tf", "doc_len"]
    if store_positions:
        cols.insert(4, "positions")
    dt = (
        spark.read.parquet(dt_path)
        .filter(F.col("bucket").isin(buckets))
        .select(*cols)
    )
    # persist: term_df (vocab-sized, tiny vs postings) feeds the hot
    # broadcast AND the final block join — without the persist each
    # use re-aggregates the full postings scan
    term_df = dt.groupBy("bucket", "term").agg(
        F.count(F.lit(1)).alias("df")
    ).persist()
    hot = term_df.filter(F.col("df") > hot_df).withColumnRenamed("df", "hot_term_df")
    salted = (
        dt.join(F.broadcast(hot), ["bucket", "term"], "left")
        .withColumn(
            "salt_bits",
            F.when(
                F.col("hot_term_df").isNotNull(),
                F.least(
                    F.ceil(F.log2(F.col("hot_term_df") / F.lit(float(hot_df)))),
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
        .drop("salt_bits", "flipped", "hot_term_df")
    )
    # pin the shuffle width: AQE coalesces by BYTES, but the encode
    # stage is CPU-bound Python — letting it coalesce to a handful of
    # partitions serializes the codec. Explicit repartition on the
    # grouping keys satisfies the groupBy's distribution (no second
    # shuffle) and keeps every core busy.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    blocks = (
        salted.repartition(n_part, "bucket", "term", "salt")
        .sortWithinPartitions("term", "salt", "doc_id")
        .mapInPandas(
            _encode_partition(avgdl, block_size, store_positions),
            schema=BLOCK_CORE_SCHEMA,
        )
    )
    out = blocks.join(term_df, ["bucket", "term"]).select(
        "bucket", "term", "df", "salt", "block_seq", "doc_id_lo",
        "doc_id_hi", "n_docs", "max_tf", "min_dl", "max_tfnorm", "payload",
    )
    # per-bucket block counts ride the write job as an Observation
    # (one count_if per bucket) instead of a read-back aggregation
    # over the just-written parquet — a whole job per batch. Gated on
    # bucket count: thousands of per-row comparisons per block would
    # cost more than the read-back job they save.
    from pyspark.sql import Observation

    nb_obs = None
    if len(buckets) <= int(os.environ.get(
            "SPARK_GRAFT_OBS_BLOCKSTATS_MAX", "128")):
        nb_obs = Observation(f"blocks_{gen}")
        out = out.observe(nb_obs, *[
            F.count_if(F.col("bucket") == b).alias(f"b{b}")
            for b in buckets
        ])
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(f"{index_dir}/data/seg_{gen}")
    )
    # per-bucket INPUT lineage + postings stats in ONE job over the
    # already-persisted term_df (no extra postings scan): the digest
    # is an order-independent xxhash64 of the exact (term, df)
    # multiset each bucket was built from (resume can verify a
    # skipped bucket's inputs against it without re-encoding —
    # build_segment_index(verify_inputs=True)); n_terms is the
    # (bucket, term) row count and n_postings = Σdf, the same values
    # the previous read-back recomputed from the written blocks
    # (block salting partitions postings, so Σ n_docs over blocks
    # = Σ df over terms).
    lineage = {
        r["bucket"]: r
        for r in term_df.groupBy("bucket")
        .agg(
            # bit_xor: order-independent and overflow-free (sum of
            # xxhash64 longs would overflow; rows are distinct per
            # (bucket, term) so xor self-cancellation cannot occur)
            F.bit_xor(F.xxhash64("term", "df")).alias("input_digest"),
            F.min("term").alias("term_min"),
            F.max("term").alias("term_max"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("df").alias("n_postings"),
        )
        .collect()
    }
    term_df.unpersist()
    if nb_obs is not None:
        row = nb_obs.get
        nblocks = {b: int(row[f"b{b}"] or 0) for b in buckets}
    else:
        # a batch whose buckets hold NO postings (rebuild of a
        # shrunken corpus) writes zero part files — schema inference
        # over the bare dir would fail; such buckets commit honest
        # all-zero manifests
        seg_root = f"{index_dir}/data/seg_{gen}"
        has_files = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(seg_root) for f in files
        )
        nblocks = {} if not has_files else {
            r["bucket"]: int(r["n_blocks"])
            for r in spark.read.parquet(seg_root)
            .filter(F.col("bucket").isin(buckets))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("n_blocks"))
            .collect()
        }
    for b in buckets:
        lin = lineage.get(b)
        _atomic_write_json(
            f"{index_dir}/manifests/{gen}/bucket_{b}.json",
            {
                "bucket": b,
                "gen": gen,
                "n_blocks": nblocks.get(b, 0),
                "n_postings": int(lin["n_postings"]) if lin else 0,
                "n_terms": int(lin["n_terms"]) if lin else 0,
                "n_docs_corpus": n_docs,
                "input_digest": int(lin["input_digest"]) if lin else 0,
                "term_min": lin["term_min"] if lin else None,
                "term_max": lin["term_max"] if lin else None,
                "status": "committed",
            },
        )


@dataclass
class BuildReport:
    built_buckets: list[int]
    skipped_buckets: list[int]
    phase_a_skipped: bool
    n_docs: int
    avgdl: float
    snapshot_version: int | None  # None while incomplete (buckets pending)
    timings: dict | None = None  # per-phase wall clock (seconds)


def build_segment_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    n_buckets: int | None = None,
    hot_df: int = 2048,
    max_salt_bits: int = 6,
    block_size: int | None = None,
    resume: bool = False,
    id_col: str = "doc_id",
    text_col: str = "content",
    buckets: list[int] | None = None,
    phase_a_shuffle: bool = False,
    store_positions: bool = False,
    verify_inputs: bool = False,
    doc_terms_df: DataFrame | None = None,
) -> BuildReport:
    """Initial build (snapshot v1), two-phase and resumable.

    ``doc_terms_df``: an already-tokenized postings frame (doc_id,
    term, tf[, positions], doc_len) — e.g. the v1 in-memory index's
    cached ``doc_terms`` over the same corpus. Phase A then writes it
    directly (doc_lens derived by a doc-count-sized distinct) instead
    of re-running the tokenizer — the 'tokenize once, ever' contract
    applied ACROSS index layouts, not just within one build.

    Phase A (once): tokenize → doc_terms parquet partitioned by term
    bucket, + doc_lens + build-params json. Phase B (per bucket,
    resumable): see ``build_bucket_segments``. Snapshot v1 + CURRENT
    commit only when every bucket's manifest exists.

    ``buckets`` limits phase B to a subset (tests use it to simulate
    an interrupted build; a real deployment passes None).

    ``verify_inputs=True`` hardens resume: instead of trusting a
    committed manifest blindly, each skipped bucket's ``input_digest``
    (order-independent xxhash64 digest of its (term, df) multiset,
    written at commit time) is recomputed from the checkpointed
    doc_terms and mismatching buckets are rebuilt. Costs one
    counts-only aggregation over the skipped buckets' postings — far
    cheaper than re-encoding, and the reference's resume
    (``Matching.py:46-57,96``) has no integrity check at all.
    Manifests written before this field existed fail verification and
    rebuild (conservative).

    ATOMIC over a LIVE index (since round 4): a fresh (resume=False)
    build into an ``index_dir`` that already holds a committed
    snapshot stages everything into a NEW generation (``rbN`` dirs)
    and commits via the same snapshot-then-CURRENT swap as updates —
    a crash mid-rebuild leaves the old snapshot serving untouched, a
    concurrent reader never sees a half-built index, and the old
    generations remain addressable until ``vacuum``. ``resume=True``
    resumes the newest staged generation (an interrupted rebuild wins
    over the committed initial build); resuming a fully committed
    build is an idempotent no-op that never rolls CURRENT back.
    """
    import time as _time

    timings: dict[str, float] = {}
    if resume:
        gen = _resumable_build_gen(index_dir)
        if gen is None:
            gen = (
                "init" if not os.path.exists(f"{index_dir}/CURRENT")
                else _next_build_gen(index_dir)
            )
    elif os.path.exists(f"{index_dir}/CURRENT"):
        gen = _next_build_gen(index_dir)  # atomic rebuild-over-live
    else:
        gen = "init"
    if corpus is not None and id_col == "doc_id" \
            and "doc_id" not in corpus.columns:
        corpus = with_doc_id(corpus)
    os.makedirs(f"{index_dir}/manifests/{gen}", exist_ok=True)
    os.makedirs(f"{index_dir}/snapshots", exist_ok=True)

    params_path = f"{index_dir}/manifests/{gen}/params.json"
    dt_path = f"{index_dir}/data/dt_{gen}"
    dl_path = f"{index_dir}/data/dl_{gen}"
    phase_a_done = resume and os.path.exists(params_path)
    if not phase_a_done and (n_buckets is None or block_size is None):
        # data-aware defaults (verdict r4 item 2): one cheap count of
        # the input sizes the layout so per-bucket posting volume
        # stays ~constant as corpora grow — nothing to hand-tune at
        # 100 TB. Explicit knobs and resumed builds skip the count.
        n_est = (
            corpus.count() if corpus is not None
            else doc_terms_df.select("doc_id").distinct().count()
        )
        if n_buckets is None:
            n_buckets = auto_n_buckets(n_est)
        if block_size is None:
            block_size = auto_block_size(n_est)
    if not phase_a_done:
        import shutil as _shutil

        # fresh (non-resume) build into a dir holding a previous
        # attempt: clear this generation's outputs first. The seg
        # write uses DYNAMIC partition overwrite (only touched buckets
        # rewrite), so a bucket that is empty in the new corpus would
        # otherwise keep the OLD corpus's partition and manifest —
        # committing stale postings into the new snapshot.
        _shutil.rmtree(f"{index_dir}/data/seg_{gen}", ignore_errors=True)
        _shutil.rmtree(f"{index_dir}/manifests/{gen}", ignore_errors=True)
        os.makedirs(f"{index_dir}/manifests/{gen}", exist_ok=True)

        from pyspark import StorageLevel

        from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.index_build import (
            doc_term_stage,
            explode_doc_terms,
        )

        _t0 = _time.monotonic()
        stage = None
        if doc_terms_df is not None:
            # pre-tokenized postings supplied (e.g. the v1 index's
            # cached doc_terms over the same corpus): write them
            # directly — no tokenizer pass at all for this build
            if store_positions and "positions" not in doc_terms_df.columns:
                raise ValueError(
                    "store_positions=True but doc_terms_df carries no "
                    "positions column"
                )
            pcols = ["doc_id", "term", "tf"]
            if store_positions:
                pcols.append("positions")
            pcols.append("doc_len")
            dt = doc_terms_df.select(*pcols).withColumn(
                "bucket", bucket_col(F.col("term"), n_buckets)
            )
        else:
            # spread a narrow input first: the tokenize UDF below is
            # the phase's CPU kernel, and a single-row-group corpus
            # file would otherwise run it on one task (no-op at scale)
            from shazam_an_industrial_strength_audio_search_algorithm__spark.session import (
                spread_input,
            )

            corpus = spread_input(corpus)
            # ONE tokenize pass: the persisted stage feeds both the
            # doc_terms explode AND the doc_lens projection —
            # 'tokenize once, ever', no second corpus pass, no
            # postings shuffle
            stage = doc_term_stage(
                corpus, id_col, text_col, with_positions=store_positions
            ).persist(StorageLevel.MEMORY_AND_DISK)
            dt = explode_doc_terms(stage, with_positions=store_positions)\
                .withColumn("bucket", bucket_col(F.col("term"), n_buckets))
        if phase_a_shuffle:
            # consolidate to one file set per bucket — enable when
            # n_buckets × task-count would explode the file count
            # (large clusters); costs a full shuffle of doc_terms
            dt = dt.repartition(n_buckets, "bucket")
        (
            dt.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(dt_path)
        )
        timings["phase_a_doc_terms"] = _time.monotonic() - _t0
        _t0 = _time.monotonic()
        # n_docs/sum_dl ride the write job as an Observation — the
        # previous read-back aggregation over the just-written parquet
        # was a whole extra job for two scalars the writer already
        # streams past (guide §1/§2: don't re-scan for metadata)
        from pyspark.sql import Observation

        if stage is not None:
            dl_src = stage.select("doc_id", "doc_len").filter(
                F.col("doc_len") > 0
            )
        else:
            # doc_len is functionally determined by doc_id, and a
            # doc's postings are co-located, so the distinct collapses
            # map-side to ~one row per doc — a doc-count-sized shuffle
            # (empty docs hold no postings, so doc_len > 0 throughout)
            dl_src = doc_terms_df.select("doc_id", "doc_len").distinct()
        obs = Observation("dl_stats")
        (
            dl_src
            .observe(obs, F.count(F.lit(1)).alias("n"),
                     F.sum("doc_len").alias("sum_dl"))
            .write.mode("overwrite")
            .parquet(dl_path)
        )
        if stage is not None:
            stage.unpersist()
        row = obs.get
        timings["phase_a_doc_lens"] = _time.monotonic() - _t0
        n_ = int(row["n"] or 0)
        sum_ = int(row["sum_dl"] or 0)
        _atomic_write_json(
            params_path,
            {
                "n_docs": n_,
                "sum_dl": sum_,
                # avgdl = exact-int sum / count, divided once in
                # doubles — bit-identical whether the sums came from a
                # full scan (build) or incremental accounting (delta
                # updates), so every path scores with the same float
                "avgdl": (sum_ / n_) if n_ else 0.0,
                "n_buckets": n_buckets,
                "block_size": block_size,
                "hot_df": hot_df,
                "max_salt_bits": max_salt_bits,
                "store_positions": store_positions,
                "format_version": 2,
            },
        )
    params = json.load(open(params_path))
    n_buckets, avgdl = params["n_buckets"], params["avgdl"]

    todo = list(range(n_buckets)) if buckets is None else list(buckets)
    skipped = [
        b for b in todo
        if resume and os.path.exists(f"{index_dir}/manifests/{gen}/bucket_{b}.json")
    ]
    if skipped and verify_inputs:
        cur = {
            r["bucket"]: int(r["d"])
            for r in spark.read.parquet(dt_path)
            .filter(F.col("bucket").isin(skipped))
            .groupBy("bucket", "term")
            .agg(F.count(F.lit(1)).alias("df"))
            .groupBy("bucket")
            .agg(F.bit_xor(F.xxhash64("term", "df")).alias("d"))
            .collect()
        }
        stale = []
        for b in skipped:
            m = json.load(open(f"{index_dir}/manifests/{gen}/bucket_{b}.json"))
            if int(m.get("input_digest", 0) or 0) != cur.get(b, 0):
                stale.append(b)
        skipped = [b for b in skipped if b not in stale]
    built = [b for b in todo if b not in skipped]
    _t0 = _time.monotonic()
    build_buckets_batch(
        spark, index_dir, gen, built, dt_path, avgdl, params["n_docs"],
        params["hot_df"], params["max_salt_bits"], params["block_size"],
        store_positions=params.get("store_positions", False),
    )
    timings["phase_b_segments"] = _time.monotonic() - _t0

    done = all(
        os.path.exists(f"{index_dir}/manifests/{gen}/bucket_{b}.json")
        for b in range(n_buckets)
    )
    version = None
    if done:
        already_current = None
        if os.path.exists(f"{index_dir}/CURRENT"):
            already_current = _read_current(index_dir)
        committed = _committed_version_of_gen(index_dir, gen)
        # idempotent re-run guard: a resume re-run that rebuilt
        # NOTHING over an already-committed generation must not
        # re-commit — rewriting CURRENT backward would silently roll
        # back updates committed after the build. A run that actually
        # (re)built buckets commits normally.
        if not built and committed is not None \
                and already_current is not None \
                and already_current >= committed:
            return BuildReport(
                built_buckets=built,
                skipped_buckets=skipped,
                phase_a_skipped=phase_a_done,
                n_docs=params["n_docs"],
                avgdl=avgdl,
                snapshot_version=committed,
                timings=timings,
            )
        # a committed generation re-verified in place (verify_inputs
        # rebuilds) keeps its version; a fresh generation commits past
        # every existing snapshot AND the current pointer — so a
        # rebuild racing a concurrent update can never clobber it
        version = committed if committed is not None \
            else _next_commit_version(index_dir)
        _atomic_write_json(
            f"{index_dir}/snapshots/v{version}.json",
            {
                "n_docs": params["n_docs"],
                "sum_dl": params.get("sum_dl"),
                "avgdl": avgdl,
                "n_buckets": n_buckets,
                "block_size": params["block_size"],
                "hot_df": params["hot_df"],
                "max_salt_bits": params["max_salt_bits"],
                "store_positions": params.get("store_positions", False),
                "doc_lens": f"data/dl_{gen}",
                "buckets": {
                    str(b): {
                        "doc_terms": f"data/dt_{gen}/bucket={b}",
                        "segments": f"data/seg_{gen}/bucket={b}",
                    }
                    for b in range(n_buckets)
                },
                "gen": gen,
                "parent": (
                    already_current if gen != "init" else None
                ),
                "operation": "initial_build" if gen == "init" else "rebuild",
            },
        )
        # snapshot first, pointer second (the atomic commit protocol);
        # never move CURRENT backward
        if already_current is None or version >= already_current:
            _write_current(index_dir, version)
    return BuildReport(
        built_buckets=built,
        skipped_buckets=skipped,
        phase_a_skipped=phase_a_done,
        n_docs=params["n_docs"],
        avgdl=avgdl,
        snapshot_version=version,
        timings=timings,
    )


# ---------------------------------------------------------------------------
# reader + query
# ---------------------------------------------------------------------------
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("df", T.LongType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("doc_len", T.LongType()),
    ]
)

DECODED_SCHEMA_POS = T.StructType(
    DECODED_SCHEMA.fields
    + [T.StructField("positions", T.ArrayType(T.LongType()))]
)


def _decode_partition(it, with_positions: bool = False,
                      passthrough: tuple[str, ...] = (),
                      explode_positions: bool = False):
    """Vectorized block → posting-rows decode. ``passthrough`` names
    per-block scalar columns (e.g. ``bucket``, ``gen_seq``) repeated
    onto every decoded row — the layered reader and compaction need
    them to resolve tombstones and regroup.

    ``explode_positions`` emits one row per OCCURRENCE with a flat
    ``pos`` long column (pure np.repeat — no per-row object arrays):
    positional queries explode anyway, and shipping array cells
    through Arrow costs ~5× the whole downstream aggregation
    (measured: positional_segment 10.1 s → see bench). ``df`` is
    dropped in this mode (a per-occurrence df column invites wrong
    aggregation; positional verification never needs it)."""
    cols = ["term", "df", "doc_id", "tf", "doc_len"]
    for pdf in it:
        outs = []
        extras = [pdf[c] for c in passthrough]
        for term, df, payload, *extra in zip(
            pdf["term"], pdf["df"], pdf["payload"], *extras
        ):
            if explode_positions:
                ids, tfs, dls, flat = decode_block(bytes(payload), True)
                d = {
                    "term": term,
                    "doc_id": np.repeat(ids, tfs),
                    "tf": np.repeat(tfs, tfs),
                    "doc_len": np.repeat(dls, tfs),
                    "pos": flat,
                }
            elif with_positions:
                ids, tfs, dls, flat = decode_block(bytes(payload), True)
                pos = np.split(flat, np.cumsum(tfs)[:-1])
                d = {"term": term, "df": int(df), "doc_id": ids,
                     "tf": tfs, "doc_len": dls, "positions": pos}
            else:
                ids, tfs, dls = decode_block(bytes(payload))
                d = {"term": term, "df": int(df), "doc_id": ids,
                     "tf": tfs, "doc_len": dls}
            for name, val in zip(passthrough, extra):
                d[name] = val
            outs.append(pd.DataFrame(d))
        if outs:
            yield pd.concat(outs, ignore_index=True)
        else:
            base = ["term", "doc_id", "tf", "doc_len", "pos"] \
                if explode_positions else cols
            d = {c: pd.Series(dtype="int64" if c != "term" else "object")
                 for c in base}
            if with_positions and not explode_positions:
                d["positions"] = pd.Series(dtype="object")
            for name in passthrough:
                d[name] = pd.Series(dtype="int64")
            yield pd.DataFrame(d)


@dataclass
class SegmentIndex:
    """Reader over a committed snapshot of the index."""

    spark: SparkSession
    index_dir: str
    snapshot: dict

    @classmethod
    def open(cls, spark: SparkSession, index_dir: str,
             version: int | None = None) -> "SegmentIndex":
        if not os.path.exists(f"{index_dir}/CURRENT"):
            raise FileNotFoundError(
                f"no committed snapshot at {index_dir} — the initial build "
                f"is incomplete; resume it"
            )
        return cls(spark=spark, index_dir=index_dir,
                   snapshot=read_snapshot(index_dir, version))

    @property
    def version(self) -> int:
        return self.snapshot["version"]

    @property
    def n_docs(self) -> int:
        return self.snapshot["n_docs"]

    @property
    def avgdl(self) -> float:
        return self.snapshot["avgdl"]

    @property
    def n_buckets(self) -> int:
        return self.snapshot["n_buckets"]

    @property
    def layers(self) -> list[dict]:
        """Delta layers stacked on the base generation (merge-on-read
        updates, `maintenance.apply_updates(mode="delta")`), oldest
        first. Empty for a compacted / freshly built index."""
        return self.snapshot.get("layers") or []

    @property
    def has_deltas(self) -> bool:
        return bool(self.layers)

    def _empty(self, kind: str) -> DataFrame:
        if kind == "segments":
            schema = T.StructType(
                [T.StructField("df", T.LongType())]
                + [f for f in BLOCK_CORE_SCHEMA.fields if f.name != "bucket"]
                + [T.StructField("bucket", T.IntegerType())]
            )
        else:
            fields = [
                T.StructField("term", T.StringType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("tf", T.IntegerType()),
            ]
            if self.snapshot.get("store_positions", False):
                fields.append(
                    T.StructField("positions", T.ArrayType(T.IntegerType()))
                )
            fields += [
                T.StructField("doc_len", T.IntegerType()),
                T.StructField("bucket", T.IntegerType()),
            ]
            schema = T.StructType(fields)
        return self.spark.createDataFrame([], schema)

    def _scan_map(self, kind: str, bmap: dict,
                  buckets: list[int] | None,
                  strict: bool = False) -> DataFrame | None:
        """One generation map's bucket paths → a single DataFrame (or
        None if nothing exists). ``basePath`` parquet scans keep
        ``bucket`` a REAL partition column (``bucket=K`` dirs) —
        statically path-pruned when a bucket list is given, and
        eligible for dynamic partition pruning when joined against a
        broadcast query-term side (``blocks_for_query_terms``). After
        updates, different buckets live in different generations;
        grouping by generation root keeps one scan per generation.

        ``strict=True`` (the BASE map) raises on a bucket missing from
        the map — a base snapshot must name every bucket, and silently
        skipping one would truncate query results; layer maps are
        sparse by design."""
        bs = list(range(self.n_buckets)) if buckets is None else list(buckets)
        by_root: dict[str, list[str]] = {}
        for b in bs:
            if strict and str(b) not in bmap:
                raise KeyError(
                    f"snapshot v{self.version} bucket map is missing "
                    f"bucket {b} — corrupt or truncated snapshot"
                )
            rel = bmap.get(str(b), {}).get(kind)
            if rel is None:
                continue
            path = f"{self.index_dir}/{rel}"
            if os.path.exists(path):
                root = os.path.dirname(path)
                by_root.setdefault(root, []).append(path)
        dfs = [
            self.spark.read.option("basePath", root).parquet(*paths)
            for root, paths in sorted(by_root.items())
        ]
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def _read_buckets(self, kind: str, buckets: list[int] | None) -> DataFrame:
        """Base generation + (if present) delta layers. Layered reads
        carry a ``gen_seq`` int column (base = 0, layer i = i+1) so
        downstream tombstone resolution knows which rows a delete
        supersedes; non-layered reads keep the historical schema
        (no ``gen_seq``) untouched."""
        base = self._scan_map(kind, self.snapshot["buckets"], buckets,
                              strict=True)
        if not self.has_deltas:
            return base if base is not None else self._empty(kind)
        parts = []
        if base is not None:
            parts.append(base.withColumn("gen_seq", F.lit(0)))
        for i, layer in enumerate(self.layers):
            piece = self._scan_map(kind, layer.get("buckets", {}), buckets)
            if piece is not None:
                parts.append(piece.withColumn("gen_seq", F.lit(i + 1)))
        if not parts:
            return self._empty(kind).withColumn("gen_seq", F.lit(0))
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        return out

    def segments(self, buckets: list[int] | None = None) -> DataFrame:
        return self._read_buckets("segments", buckets)

    def doc_terms(self, buckets: list[int] | None = None) -> DataFrame:
        return self._read_buckets("doc_terms", buckets)

    def tombstones(self) -> DataFrame | None:
        """(doc_id, gen_seq) union of the layers' tombstone sets, or
        None when no layer carries deletes. A tombstone at gen_seq s
        supersedes postings with gen_seq < s (re-adds in the SAME
        update survive their own tombstone)."""
        parts = []
        for i, layer in enumerate(self.layers):
            rel = layer.get("tombstones")
            if rel:
                parts.append(
                    self.spark.read.parquet(f"{self.index_dir}/{rel}")
                    .select("doc_id", F.lit(i + 1).alias("gen_seq"))
                )
        if not parts:
            return None
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        return out

    def doc_lens(self) -> DataFrame:
        """(doc_id, doc_len) of the ALIVE corpus. Non-layered: one
        parquet scan. Layered: base + per-layer delta doc_lens,
        tombstone-resolved — doc_lens is never rewritten by a delta
        update (it would be the one remaining O(index) write in an
        otherwise O(delta) update)."""
        base = self.spark.read.parquet(
            f"{self.index_dir}/{self.snapshot['doc_lens']}"
        )
        if not self.has_deltas:
            return base
        parts = [base.withColumn("gen_seq", F.lit(0))]
        for i, layer in enumerate(self.layers):
            rel = layer.get("doc_lens_delta")
            if rel and os.path.exists(f"{self.index_dir}/{rel}"):
                parts.append(
                    self.spark.read.parquet(f"{self.index_dir}/{rel}")
                    .withColumn("gen_seq", F.lit(i + 1))
                )
        out = parts[0]
        for d in parts[1:]:
            out = out.unionByName(d)
        tomb = self.tombstones()
        if tomb is not None:
            tmax = tomb.groupBy("doc_id").agg(
                F.max("gen_seq").alias("tomb_seq")
            )
            out = (
                out.join(F.broadcast(tmax), "doc_id", "left")
                .filter(
                    F.col("tomb_seq").isNull()
                    | (F.col("gen_seq") >= F.col("tomb_seq"))
                )
                .drop("tomb_seq")
            )
        return out.drop("gen_seq")

    def blocks_for_terms(self, terms: list[str]) -> DataFrame:
        """Bucket-pruned + term-predicate-pushed block scan — the
        reference's 'touch only LUT entries for the query keys'
        access path (SURVEY §4), done by the storage layer. For
        driver-known term lists (interactive / small batches): the
        ``isin`` predicate reaches parquet row-group stats. For term
        sets living in a DataFrame, use ``blocks_for_query_terms``
        (collect-free)."""
        buckets = resolve_buckets(self.spark, terms, self.n_buckets)
        if not buckets:
            return self.segments([0]).filter(F.lit(False))
        return self.segments(buckets).filter(F.col("term").isin(terms))

    def blocks_for_term_prefixes(self, prefixes: list[str]) -> DataFrame:
        """Term-DICTIONARY range scan: every block whose term starts
        with one of ``prefixes`` (the fulltext analog of an identifier
        prefix search over source code). Bucket pruning does not apply
        — term-hash bucketing scatters a lexicographic range across
        every bucket by construction — but the ``StartsWith``
        disjunction is pushed to the parquet scan, where the encoder's
        (bucket, term)-clustered writes give row groups tight min/max
        term stats, so non-matching row groups are skipped at the
        storage layer. At 100 TB the scan stays bounded by the
        dictionary slice, not the corpus."""
        if not prefixes:
            return self.segments([0]).filter(F.lit(False))
        pred = F.col("term").startswith(prefixes[0])
        for p in prefixes[1:]:
            pred = pred | F.col("term").startswith(p)
        return self.segments(None).filter(pred)

    def postings_for_term_prefixes(self, prefixes: list[str],
                                   with_positions: bool = False) -> DataFrame:
        """Decoded (tombstone-resolved) postings for every indexed term
        matching any of ``prefixes``."""
        out = self._spread(self.blocks_for_term_prefixes(prefixes),
                           with_positions, passthrough=("gen_seq",))
        return self._resolve_layers(out) if self.has_deltas else out

    def blocks_for_query_terms(self, qt: DataFrame) -> DataFrame:
        """Collect-free block access: the (tiny) distinct-term frame
        broadcasts and inner-joins the block scan on (bucket, term).
        ``bucket`` is a partition column and the dim side carries a
        selective predicate, so Spark plans DYNAMIC PARTITION PRUNING
        — untouched buckets' files are never listed into tasks, with
        zero driver-side collection of the term set (the round-1
        reviewer's large-query-batch bottleneck). Output = block rows
        (one per block even if a term serves many queries)."""
        qtb = (
            qt.select("term").distinct()
            # a selective predicate on the build side is what makes
            # Spark's DPP planner inject the pruning subquery
            .filter(F.col("term") != "")
            .withColumn("bucket", bucket_col(F.col("term"), self.n_buckets))
        )
        return self.segments(None).join(F.broadcast(qtb), ["bucket", "term"])

    def _spread(self, blocks: DataFrame,
                with_positions: bool = False,
                passthrough: tuple[str, ...] = (),
                explode_positions: bool = False) -> DataFrame:
        # spread the decode: compressed blocks are few MB (file-packing
        # would scan them in 1-2 partitions) but varint decode is
        # CPU-bound — a cheap round-robin repartition parallelizes it
        if with_positions and not self.snapshot.get("store_positions", False):
            raise ValueError(
                "index was built with store_positions=False — "
                "positions are not in the blocks"
            )
        passthrough = tuple(
            c for c in passthrough if c in blocks.columns
        )
        if explode_positions:
            fields = [
                T.StructField("term", T.StringType()),
                T.StructField("doc_id", T.LongType()),
                T.StructField("tf", T.LongType()),
                T.StructField("doc_len", T.LongType()),
                T.StructField("pos", T.LongType()),
            ]
        else:
            fields = list(
                (DECODED_SCHEMA_POS if with_positions
                 else DECODED_SCHEMA).fields
            )
        for c in passthrough:
            fields.append(T.StructField(
                c, T.IntegerType() if c in ("bucket", "gen_seq")
                else T.LongType()
            ))
        n_part = int(self.spark.conf.get("spark.sql.shuffle.partitions"))
        # hash-spread on the block identity, NOT keyless round-robin:
        # repartition(n) pays a local sort of every input partition
        # (sortBeforeRepartition, needed to make round-robin
        # deterministic under task retry) and that sort moves the
        # compressed payload bytes; hashing (term, salt, block_seq) is
        # deterministic by construction — same spread, no sort
        # (guide §2.5 deterministic-keys rule)
        return blocks.repartition(
            n_part, F.xxhash64("term", "salt", "block_seq")
        ).mapInPandas(
            lambda it: _decode_partition(it, with_positions, passthrough,
                                         explode_positions),
            schema=T.StructType(fields),
        )

    def _resolve_layers(self, decoded: DataFrame,
                        recompute_df: bool = True) -> DataFrame:
        """Merge-on-read resolution over decoded layered postings:
        (1) drop rows superseded by a newer tombstone (a delete or an
        overwrite-by-key tombstones the doc's older generations);
        (2) recompute ``df`` exactly over the survivors — the stored
        per-generation df is a partial count once layers exist. The
        window shuffle touches only the decoded (query-term-bounded)
        rows, never the whole index. Scale note: between compactions
        the tombstone set is delta-sized, so the broadcast is small;
        a long-uncompacted index should compact rather than grow it.
        Output schema matches the non-layered decode (no gen_seq)."""
        tomb = self.tombstones()
        if tomb is not None:
            tmax = tomb.groupBy("doc_id").agg(
                F.max("gen_seq").alias("tomb_seq")
            )
            decoded = (
                decoded.join(F.broadcast(tmax), "doc_id", "left")
                .filter(
                    F.col("tomb_seq").isNull()
                    | (F.col("gen_seq") >= F.col("tomb_seq"))
                )
                .drop("tomb_seq")
            )
        if not recompute_df or "df" not in decoded.columns:
            # compaction re-derives df from the merged postings, and
            # the exploded-positions reader drops df entirely —
            # skipping the window here saves a full shuffle of every
            # surviving posting by term
            return decoded.drop("gen_seq")
        w = Window.partitionBy("term")
        return (
            decoded
            .withColumn("df", F.count(F.lit(1)).over(w))
            .drop("gen_seq")
        )

    def postings_for_terms(self, terms: list[str],
                           with_positions: bool = False) -> DataFrame:
        out = self._spread(self.blocks_for_terms(terms), with_positions,
                           passthrough=("gen_seq",))
        return self._resolve_layers(out) if self.has_deltas else out

    def postings_for_query_terms(self, qt: DataFrame,
                                 with_positions: bool = False) -> DataFrame:
        """Decoded postings for every distinct term in ``qt`` —
        collect-free (see ``blocks_for_query_terms``). On a layered
        index the result is tombstone-resolved with exact df."""
        out = self._spread(self.blocks_for_query_terms(qt), with_positions,
                           passthrough=("gen_seq",))
        return self._resolve_layers(out) if self.has_deltas else out

    def positions_for_query_terms(self, qt: DataFrame) -> DataFrame:
        """Occurrence-exploded postings (term, doc_id, tf, doc_len,
        pos) for positional queries — positions flatten to a long
        column INSIDE the decode kernel (np.repeat), never riding
        through Arrow as per-row arrays only for Spark to explode
        them again (that object-array round trip dominated the
        positional_segment wall clock). No df column by design."""
        out = self._spread(
            self.blocks_for_query_terms(qt),
            with_positions=True,  # store_positions guard
            passthrough=("gen_seq",),
            explode_positions=True,
        )
        return self._resolve_layers(out) if self.has_deltas else out

    def merged_doc_terms(self, buckets: list[int] | None = None) -> DataFrame:
        """The layered index resolved to its logical doc_terms —
        decoded from the SEGMENTS (never re-tokenizing the corpus),
        tombstone-resolved, typed to match the doc_terms parquet
        schema. This is compaction's input: the multi-way sorted merge
        is expressed declaratively (union of sorted block streams →
        sort-based shuffle regroup) and the encoder re-blocks it."""
        blocks = self.segments(buckets)
        decoded = self._spread(
            blocks,
            with_positions=self.snapshot.get("store_positions", False),
            passthrough=("bucket", "gen_seq"),
        )
        if self.has_deltas:
            decoded = self._resolve_layers(decoded, recompute_df=False)
        cols = [
            F.col("doc_id"),
            F.col("term"),
            F.col("tf").cast("int").alias("tf"),
        ]
        if self.snapshot.get("store_positions", False):
            cols.append(
                F.col("positions").cast("array<int>").alias("positions")
            )
        cols += [
            F.col("doc_len").cast("int").alias("doc_len"),
            F.col("bucket").cast("int").alias("bucket"),
        ]
        return decoded.select(*cols)

    def idf(self, df: int) -> float:
        return idf_py(df, self.n_docs)


EST_BYTES_PER_CANDIDATE_ROW = 48  # doc_id + tf + doc_len + query_id
#                                   + shuffle framing, conservative


def estimate_brute_materialization(index: SegmentIndex,
                                   qt: DataFrame) -> dict:
    """Candidate-row estimate for a brute top-k over ``qt``
    ((query_id, term) pairs): every posting of a term materializes
    once per query containing it — exactly the intermediate state the
    score shuffle spills. One metadata-only job (bucket-pruned block
    stats; payloads never read)."""
    per_term_q = qt.groupBy("term").agg(F.count(F.lit(1)).alias("nq"))
    blocks = index.blocks_for_query_terms(qt).select("term", "n_docs")
    row = blocks.join(F.broadcast(per_term_q), "term").agg(
        F.coalesce(F.sum(F.col("n_docs") * F.col("nq")), F.lit(0))
        .alias("rows")
    ).collect()[0]
    rows = int(row["rows"])
    return {"rows": rows, "bytes": rows * EST_BYTES_PER_CANDIDATE_ROW}


def _scratch_budget_bytes(spark: SparkSession) -> int | None:
    """Scratch budget for fail-fast checks: env override
    ``SPARK_GRAFT_SCRATCH_BUDGET_BYTES`` (``0``/``none`` disables),
    else half the free space on the shuffle scratch volume."""
    env = os.environ.get("SPARK_GRAFT_SCRATCH_BUDGET_BYTES")
    if env is not None:
        if env.strip().lower() in ("0", "none", ""):
            return None
        return int(env)
    local = spark.conf.get("spark.local.dir", None) or "/tmp"
    try:
        return shutil.disk_usage(local.split(",")[0]).free // 2
    except OSError:
        return None


def segment_topk(
    index: SegmentIndex,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "query_id",
    text_col: str = "text",
    micro: bool = False,
    scratch_check: bool = True,
) -> DataFrame:
    """BM25 top-k over the persisted segment index.

    Plan: query terms (tiny, broadcast — NEVER collected to the
    driver) ⋈ block scan (bucket partitions dynamically pruned from
    the broadcast side) → ``mapInPandas`` varint decode → score
    (doc_len inline, no norms join) → groupBy(query, doc) sum →
    row_number ≤ k. Semantics identical to operators/topk.bm25_topk
    (tests/test_segments.py).

    ``micro=True`` switches to exact integer micro-unit scoring
    (round each per-term contribution to 1e-6 BEFORE the sum — the
    fold-order-independent convention every oracle-gated path
    shares): output column becomes ``score_micro`` (long) and rank is
    long, matching the driver-gate schema.

    ``scratch_check`` (round-5 item 8): the un-pruned path
    materializes ~(postings × queries-per-term) candidate rows
    through the score shuffle — at 4M docs that exhausted a 50 GB
    scratch volume (ENOSPC ×2, BENCH/BASELINE.md §round-4) while WAND
    completed. The estimated materialization is checked against the
    scratch budget (env ``SPARK_GRAFT_SCRATCH_BUDGET_BYTES``, or half
    the free scratch space) and fails FAST with a pointer at
    ``wand_topk`` instead of dying hours in. One metadata-only job;
    pass False to skip.
    """
    from shazam_an_industrial_strength_audio_search_algorithm__spark.operators.topk import (
        query_terms,
    )

    qt = query_terms(queries, id_col, text_col)
    if scratch_check:
        budget = _scratch_budget_bytes(index.spark)
        if budget is not None:
            est = estimate_brute_materialization(index, qt)
            if est["bytes"] > budget:
                raise RuntimeError(
                    f"brute top-k would materialize ~{est['rows']:,} "
                    f"candidate rows (~{est['bytes'] / 1e9:.1f} GB) "
                    "through the score shuffle — over the scratch "
                    f"budget ({budget / 1e9:.1f} GB). Use wand_topk "
                    "(block-max pruned; completed at 4M docs where "
                    "this path ENOSPC'd) or raise "
                    "SPARK_GRAFT_SCRATCH_BUDGET_BYTES / pass "
                    "scratch_check=False to force."
                )
    postings = index.postings_for_query_terms(qt)
    term_score = score_col(F.col("tf"), F.col("df"), F.col("doc_len"),
                           index.n_docs, index.avgdl)
    # ONE exchange for score-sum AND rank window (guide §2.4): hash
    # the candidate rows by query_id alone — that distribution
    # satisfies both groupBy(query_id, doc_id) (subset clustering) and
    # Window.partitionBy(query_id), so the post-agg re-shuffle the
    # default plan inserts before the window disappears. Map-side
    # partial agg collapsed ~nothing here anyway (a (query, doc)
    # pair's rows arrive term-major, one term per map partition).
    candidates = postings.join(F.broadcast(qt), "term").repartition(
        F.col("query_id")
    )
    if micro:
        contrib = F.round(term_score * F.lit(1_000_000.0)).cast("long")
        scored = (
            candidates
            .withColumn("contrib_micro", contrib)
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum("contrib_micro").alias("score_micro"),
                F.count(F.lit(1)).cast("long").alias("matched_terms"),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("score_micro").desc(), F.col("doc_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w).cast("long"))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "doc_id", "score_micro",
                    "matched_terms")
        )
    scored = (
        candidates
        .withColumn("term_score", term_score)
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
