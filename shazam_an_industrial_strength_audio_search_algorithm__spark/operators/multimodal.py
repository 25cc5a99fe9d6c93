"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata — and REAL decode for the uncompressed
container formats that need no codec library.

``decode_media`` is a real parser since round 4: RIFF/WAV PCM (pure
numpy — the analog of the reference's ``read_audio``,
``/root/reference/utils/_helper_basics_.py:62-113``) and binary PPM
(P6). Only genuinely compressed formats (mp3/jpeg/png and the
sandbox's opaque ``bin`` kind) remain behind the honest
``NotImplementedError`` stub, and corrupt payloads are routed to a
quarantine status instead of crashing the job (the reference's
decode-error skip, ``Matching.py:113-117``). The Spark-side plumbing
is real throughout: schemas, Arrow batch shapes, ``mapInPandas``
signatures, and partition behavior are exactly what a production
decode pipeline uses; swapping in PIL/ffmpeg for the compressed
formats changes one inner function.

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


# ---------------------------------------------------------------------------
# real decode: RIFF/WAV PCM + binary PPM (pure numpy, no codec libs)
# ---------------------------------------------------------------------------
# formats we RECOGNIZE but cannot decode without codec libraries —
# these stay behind the honest NotImplementedError stub
_COMPRESSED_MAGICS: tuple[tuple[bytes, str], ...] = (
    (b"\xff\xd8\xff", "jpeg"),
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"ID3", "mp3"),
    (b"\xff\xfb", "mp3"),
    (b"\xff\xf3", "mp3"),
    (b"BIN0", "bin"),  # the sandbox's declared-opaque kind
)


def _decode_wav(payload: bytes) -> tuple[np.ndarray, dict]:
    """RIFF/WAVE PCM parser — chunk walk + int16 frombuffer. Raises
    ValueError on any structural violation (truncation, bad sizes,
    non-PCM) so callers can quarantine (``Matching.py:113-117``)."""
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("wav: truncated or missing WAVE form")
    riff_size = int.from_bytes(payload[4:8], "little")
    if riff_size + 8 > len(payload):
        raise ValueError("wav: RIFF size exceeds payload")
    fmt = None
    data = None
    off = 12
    while off + 8 <= len(payload):
        cid = payload[off:off + 4]
        csize = int.from_bytes(payload[off + 4:off + 8], "little")
        body = payload[off + 8:off + 8 + csize]
        if len(body) != csize:
            raise ValueError(f"wav: chunk {cid!r} truncated")
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("wav: fmt chunk too short")
            fmt = {
                "audio_format": int.from_bytes(body[0:2], "little"),
                "channels": int.from_bytes(body[2:4], "little"),
                "sample_rate": int.from_bytes(body[4:8], "little"),
                "bits": int.from_bytes(body[14:16], "little"),
            }
        elif cid == b"data":
            data = body
        off += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("wav: missing fmt or data chunk")
    if fmt["audio_format"] != 1 or fmt["bits"] != 16:
        raise ValueError(
            f"wav: only PCM16 supported, got format={fmt['audio_format']} "
            f"bits={fmt['bits']}"
        )
    if fmt["channels"] < 1 or len(data) % (2 * fmt["channels"]):
        raise ValueError("wav: data size not a whole number of frames")
    samples = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return samples, {"fmt": "wav", "scale": 32768.0, **fmt}


def _postprocess_audio(samples: np.ndarray, meta: dict,
                       target_rate: int) -> tuple[np.ndarray, dict]:
    """Channel/rate normalization after the raw PCM parse — the
    reference mono-mixes multi-channel audio and resamples to its
    configured rate before featurization
    (``/root/reference/utils/_helper_basics_.py:102-108``). Here:

    - de-interleave + MEAN-MIX to mono (integer floor mean across
      channels, so the value stream stays int64 and the DuckDB oracle
      can recompute it exactly);
    - integer-ratio DOWNsample to ``target_rate`` via block floor-mean
      (the library-free stand-in for a filtered resample; partial
      trailing blocks are dropped). Non-integer ratios and upsampling
      genuinely need a DSP library → ``NotImplementedError`` (routed
      to the ``unsupported`` quarantine, same as compressed codecs).
    """
    ch = int(meta["channels"])
    if ch > 1:
        samples = samples.reshape(-1, ch).sum(axis=1) // ch
    src_rate = int(meta["sample_rate"])
    if src_rate != target_rate:
        if src_rate % target_rate:
            raise NotImplementedError(
                f"wav: resample {src_rate}->{target_rate} Hz is not an "
                "integer-ratio downsample; needs a DSP library"
            )
        r = src_rate // target_rate
        samples = samples[: (samples.size // r) * r]
        samples = samples.reshape(-1, r).sum(axis=1) // r
    out_meta = dict(meta)
    out_meta.update(
        channels=1, sample_rate=target_rate,
        src_channels=ch, src_sample_rate=src_rate,
    )
    return samples, out_meta


def _decode_ppm(payload: bytes) -> tuple[np.ndarray, dict]:
    """Binary PPM (P6) parser: whitespace/comment-tolerant header,
    exact-length raw RGB validation."""
    if payload[:2] != b"P6":
        raise ValueError("ppm: bad magic")
    # tokenize the header: P6, width, height, maxval — '#' comments
    # run to end of line; ONE whitespace byte then raw data
    pos, toks = 2, []
    while len(toks) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if pos < len(payload) and payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("ppm: truncated header")
        try:
            toks.append(int(payload[start:pos]))
        except ValueError:
            raise ValueError("ppm: non-numeric header token") from None
    w, h, maxval = toks
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError(f"ppm: bad dimensions {w}x{h} maxval={maxval}")
    pos += 1  # the single whitespace after maxval
    data = payload[pos:pos + w * h * 3]
    if len(data) != w * h * 3:
        raise ValueError("ppm: raster truncated")
    values = np.frombuffer(data, dtype=np.uint8).astype(np.int64)
    return values, {"fmt": "ppm", "scale": 255.0,
                    "width": w, "height": h, "maxval": maxval}


def decode_media(payload: bytes,
                 target_rate: int | None = None) -> tuple[np.ndarray, dict]:
    """Decode a media payload to its scalar value stream + metadata.

    Real for uncompressed containers (RIFF/WAV PCM16, binary PPM);
    ``NotImplementedError`` for recognized compressed formats (no
    codec library in this environment — the honest stub, now scoped
    to exactly the formats that need one); ``ValueError`` for corrupt
    or unknown bytes. Audio is normalized after the parse — mono
    mean-mix + integer-ratio downsample to ``target_rate`` (default
    ``SAMPLE_RATE``) — matching the reference's ``read_audio``
    channel/rate normalization (``_helper_basics_.py:102-108``); its
    decode-error skip is ``Matching.py:113-117``.
    """
    payload = bytes(payload)
    if payload[:4] == b"RIFF":
        samples, meta = _decode_wav(payload)
        return _postprocess_audio(
            samples, meta,
            SAMPLE_RATE if target_rate is None else target_rate,
        )
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    for magic, name in _COMPRESSED_MAGICS:
        if payload[:len(magic)] == magic:
            raise NotImplementedError(
                f"no codec library in this environment to decode "
                f"{name!r}; feature extraction falls back to the "
                "deterministic fake (_fake_decode)"
            )
    raise ValueError("unknown or corrupt media payload")


def _real_features(values: np.ndarray, scale: float) -> np.ndarray:
    """FEATURE_DIM-band mean-|amplitude| envelope of the decoded value
    stream — deterministic, library-free, and actually a function of
    the DECODED samples (not the raw bytes)."""
    out = np.zeros(FEATURE_DIM, dtype=np.float64)
    if values.size:
        for i, chunk in enumerate(np.array_split(values, FEATURE_DIM)):
            if chunk.size:
                out[i] = np.abs(chunk).mean() / scale
    return out.round(6)


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    production dataflow (Arrow batches of binary in, fixed-dim float
    vectors out). Decodable payloads (WAV/PPM) produce REAL features
    of their decoded samples; recognized-but-compressed formats fall
    back to the deterministic fake; corrupt payloads yield a NULL
    feature (the quarantine signal — filter or join against
    ``decode_stats`` for the reason)."""

    def one(p: bytes):
        try:
            values, meta = decode_media(bytes(p))
            return _real_features(values, meta["scale"]).tolist()
        except NotImplementedError:
            return _fake_decode(bytes(p)).tolist()
        except ValueError:
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {"media_id": pdf["media_id"],
                 "feature": [one(p) for p in pdf["payload"]]}
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic real-container synthesis + decode-stats (driver-gated)
# ---------------------------------------------------------------------------
# generator parameters — shared by the Spark synth, the tests, and the
# DuckDB oracle (api.Q_MEDIA_DECODE_SQL recomputes the sample streams
# from these same formulas over generate_series)
WAV_BASE_N, WAV_MOD_N = 200, 57            # n_frames = 200 + id % 57
WAV_A, WAV_B, WAV_C = 31, 17, 7            # s[c,i] = ((id*31+i*17+c*11+7) % 65536) - 32768
WAV_D = 11                                 # per-channel offset coefficient
PPM_W_BASE, PPM_W_MOD = 8, 9               # width  = 8 + id % 9
PPM_H_BASE, PPM_H_MOD = 6, 7               # height = 6 + id % 7
PPM_A, PPM_B = 7, 13                       # pix[i] = (id*7 + i*13) % 256
CORRUPT_MOD, CORRUPT_RESIDUE = 13, 5       # id%13==5 → truncated payload
SAMPLE_RATE = 8000
# wav flavor sub-cycle within the wav kind (doc_id % 3 == 0):
#   doc_id % 9 == 0 → mono    @ 8 kHz (identity normalization)
#   doc_id % 9 == 3 → stereo  @ 8 kHz (mean-mix path)
#   doc_id % 9 == 6 → mono    @ 16 kHz, 2n frames (2:1 downsample path)
WAV_HI_RATE = 16000


def synth_wav_bytes(doc_id: int, channels: int = 1,
                    sample_rate: int = SAMPLE_RATE,
                    n_frames: int | None = None) -> bytes:
    """A real RIFF/WAVE PCM16 file whose samples are a pure function
    of ``doc_id`` — decodable by ANY wav reader, and whose decoded
    aggregate stats are recomputable in SQL. Channel ``c`` of frame
    ``i`` is ``((id*31 + i*17 + c*11 + 7) % 65536) - 32768``
    (``c=0`` reproduces the original mono fixture byte-for-byte)."""
    n = WAV_BASE_N + doc_id % WAV_MOD_N if n_frames is None else n_frames
    i = np.arange(n, dtype=np.int64)[:, None]
    c = np.arange(channels, dtype=np.int64)[None, :]
    samples = (
        (doc_id * WAV_A + i * WAV_B + c * WAV_D + WAV_C) % 65536 - 32768
    ).astype("<i2")  # (n_frames, channels) row-major == interleaved
    data = samples.tobytes()
    block_align = 2 * channels
    hdr = (
        b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little")
        + (sample_rate * block_align).to_bytes(4, "little")
        + block_align.to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(data).to_bytes(4, "little")
    )
    return hdr + data


def synth_ppm_bytes(doc_id: int) -> bytes:
    """A real binary PPM (P6) whose raster is a pure function of
    ``doc_id``."""
    w = PPM_W_BASE + doc_id % PPM_W_MOD
    h = PPM_H_BASE + doc_id % PPM_H_MOD
    i = np.arange(w * h * 3, dtype=np.int64)
    pix = ((doc_id * PPM_A + i * PPM_B) % 256).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + pix.tobytes()


def synth_real_media(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic REAL media table: every third doc gets a genuine
    WAV (PCM16 — cycling mono@8k / stereo@8k / mono@16k-2n flavors so
    the mean-mix and downsample normalization paths are exercised),
    every third a genuine PPM (P6), every third an opaque ``bin``
    payload (the still-stubbed compressed-format stand-in); docs with
    ``doc_id % 13 == 5`` (wav/ppm only) are TRUNCATED to 9 bytes —
    the corrupt-input fixture for the quarantine path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, payloads = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                doc_id = int(doc_id)
                k = doc_id % 3
                if k == 0:
                    flavor = doc_id % 9
                    if flavor == 3:
                        payload = synth_wav_bytes(doc_id, channels=2)
                    elif flavor == 6:
                        payload = synth_wav_bytes(
                            doc_id, sample_rate=WAV_HI_RATE,
                            n_frames=2 * (WAV_BASE_N + doc_id % WAV_MOD_N),
                        )
                    else:
                        payload = synth_wav_bytes(doc_id)
                    kind = "wav"
                elif k == 1:
                    kind, payload = "ppm", synth_ppm_bytes(doc_id)
                else:
                    kind, payload = "bin", b"BIN0" + str(text).encode()
                if (doc_id % CORRUPT_MOD == CORRUPT_RESIDUE
                        and kind != "bin"):
                    payload = payload[:9]
                ids.append(doc_id)
                kinds.append(kind)
                payloads.append(payload)
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"),
                 "kind": pd.Series(kinds, dtype="object"),
                 "payload": pd.Series(payloads, dtype="object")}
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(run, schema=MEDIA_SCHEMA)


DECODE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("n_units", T.LongType()),
        T.StructField("val_sum", T.LongType()),
        T.StructField("val_min", T.LongType()),
        T.StructField("val_max", T.LongType()),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """REAL decode of every payload (mapInPandas, Arrow-batched):
    per-media decoded-value aggregates for decodable formats, and the
    quarantine statuses for the rest — ``corrupt`` (structurally bad
    bytes, ValueError) vs ``unsupported`` (recognized compressed
    format with no codec here, NotImplementedError). Sentinel ``-1``
    stats keep the output integer-typed for the value gate. ↔ the
    reference's decode-error skip (``Matching.py:113-117``): bad
    media is recorded and stepped over, never fatal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("media_id", "fmt", "status", "n_units",
                                   "val_sum", "val_min", "val_max")}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                fmt, status = "none", "ok"
                n = s = lo = hi = -1
                try:
                    values, meta = decode_media(bytes(p))
                    fmt = meta["fmt"]
                    n = int(values.size)
                    s = int(values.sum())
                    lo = int(values.min()) if values.size else -1
                    hi = int(values.max()) if values.size else -1
                except NotImplementedError:
                    status = "unsupported"
                except ValueError:
                    status = "corrupt"
                out["media_id"].append(int(mid))
                out["fmt"].append(fmt)
                out["status"].append(status)
                out["n_units"].append(n)
                out["val_sum"].append(s)
                out["val_min"].append(lo)
                out["val_max"].append(hi)
            yield pd.DataFrame(
                {"media_id": pd.Series(out["media_id"], dtype="int64"),
                 "fmt": pd.Series(out["fmt"], dtype="object"),
                 "status": pd.Series(out["status"], dtype="object"),
                 "n_units": pd.Series(out["n_units"], dtype="int64"),
                 "val_sum": pd.Series(out["val_sum"], dtype="int64"),
                 "val_min": pd.Series(out["val_min"], dtype="int64"),
                 "val_max": pd.Series(out["val_max"], dtype="int64")}
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=DECODE_STATS_SCHEMA
    )


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
