"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/resize/frame-sample kernels require codec libraries that
are not in this container — they are STUBBED behind
``NotImplementedError`` or a clearly-marked deterministic fake. The
Spark-side plumbing is real and tested: schemas, Arrow batch shapes,
``mapInPandas`` signatures, and partition behavior are exactly what a
production decode pipeline uses; swapping the fake for PIL/ffmpeg
changes one inner function.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads
fits executor memory, and never collect payloads to the driver. The
metadata extractor is a narrow projection (scan-speed); feature
extraction is CPU-bound per row and scales linearly with executors.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("magic", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synth_media(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Deterministic fake media table: payload = utf-8 bytes of the
    text with a 4-byte magic prefix per kind. Stands in for real
    image/audio blobs so the binary plumbing is exercised end-to-end."""
    kind = F.element_at(
        F.array(F.lit("img"), F.lit("aud"), F.lit("vid")),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    magic = F.concat(kind, F.lit("0"))
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.concat(magic, F.col(text_col)), "utf-8").alias("payload"),
    )


def extract_meta(media: DataFrame) -> DataFrame:
    """Typed metadata — real, no stubs: byte length, sha256 (the
    per-row integrity invariant, ↔ the reference's decode-error check
    ``Matching.py:113-117``), magic-sniffed format tag."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.decode(F.substring("payload", 1, 4), "utf-8").alias("magic"),
    )


def _fake_decode(payload: bytes) -> np.ndarray:
    """STUB — deterministic fake for the codec-library decode.

    A real deployment replaces this one function with e.g.
    ``PIL.Image.open(io.BytesIO(payload))`` + resize, or
    ``soundfile.read``. The fake derives a FEATURE_DIM float vector
    from sha256(payload) so tests have stable known answers.
    """
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8)
    return (raw.astype(np.float64) / 255.0).round(6)


def decode_media(payload: bytes, kind: str):
    """The honest stub: raises until a codec library is installed."""
    raise NotImplementedError(
        f"no codec library in this environment to decode kind={kind!r}; "
        "feature extraction uses the deterministic fake (_fake_decode)"
    )


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    production dataflow (Arrow batches of binary in, fixed-dim float
    vectors out); only the inner decode is the deterministic fake."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(bytes(p)).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64,
                 max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing: slice the payload at a fixed stride
    (stands in for video frame extraction). Output one row per frame:
    (media_id, frame_idx, frame_sha). Real: frame boundaries from the
    container format; fake: byte stride — the partitioning/explode
    dataflow is identical."""
    # byte-slicing binary is awkward as a column expression; do it in
    # Arrow batches like a real frame extractor would
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_sha", T.StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                for fi, s in enumerate(range(0, len(b), every_n_bytes)):
                    if fi >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    shas.append(
                        hashlib.sha256(b[s:s + every_n_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs, dtype="int32"),
                 "frame_sha": pd.Series(shas, dtype="object")}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=out_schema)
