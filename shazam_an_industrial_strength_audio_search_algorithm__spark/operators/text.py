"""Text-analysis operators for a large-scale training-data pipeline:
language ID, quality scoring, token counting, document fingerprinting.

All four are pure column expressions (whole-stage codegen, no Python)
with exact DuckDB SQL twins for the driver oracle. They share the
engine's canonical tokenizer fragments so results are reproducible
across engines.

Scale notes: every operator here is a narrow projection — zero
shuffles; at 100 TB they run at scan speed and benefit from parquet
column pruning (only ``text`` is read).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shazam_an_industrial_strength_audio_search_algorithm__spark.functions.tokenize import (
    DUCKDB_TOKENS_SQL,
    tokens_col,
)

# Deterministic mini stopword tables for the n-gram/stopword language
# heuristic. Real deployments swap in fastText/CLD3 via a pandas UDF —
# the dataflow (narrow projection) is identical.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "ein", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pas"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "no"],
}
MOD = 1_000_000_007
FP_MULT = 31


def lang_scores(text_col: Column) -> list[tuple[str, Column]]:
    toks = tokens_col(text_col)

    def hits_for(words: list[str]) -> Column:
        # single-arg lambda: F.filter treats two-arg lambdas as
        # (element, index) — a default arg would receive the index
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    return [(lang, hits_for(words)) for lang, words in STOPWORDS.items()]


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Predicted language = argmax stopword hits; 'und' (undetermined)
    when no stopword matches. Ties break to the lexicographically
    LARGEST language code (struct-max semantics) — deterministic and
    reproduced verbatim by the SQL twin."""
    scores = lang_scores(F.col(text_col))
    pairs = F.array(
        *[F.struct(hits.alias("hits"), F.lit(lang).alias("lang"))
          for lang, hits in scores]
    )
    best = F.array_max(pairs)
    return df.withColumn(
        "pred_lang",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def duckdb_lang_id_sql(text: str) -> str:
    """SQL twin of with_lang_id: argmax hits, ties to largest lang."""
    toks = DUCKDB_TOKENS_SQL.format(col=text)
    hits = {}
    for lang, words in STOPWORDS.items():
        ws = ", ".join(f"'{w}'" for w in words)
        hits[lang] = f"len(list_filter({toks}, t -> t IN ({ws})))"
    langs_desc = sorted(STOPWORDS, reverse=True)  # fr, es, en, de
    clauses = []
    for i, lang in enumerate(langs_desc[:-1]):
        conds = " AND ".join(
            f"{hits[lang]} >= {hits[other]}" for other in langs_desc[i + 1:]
        )
        clauses.append(f"WHEN {conds} THEN '{lang}'")
    all_hits = ", ".join(hits.values())
    return (
        f"CASE WHEN greatest({all_hits}) = 0 THEN 'und' "
        + " ".join(clauses)
        + f" ELSE '{langs_desc[-1]}' END"
    )


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features: n_tokens, mean token length (micro-units),
    stopword ratio (micro), alnum character ratio (micro) — integer
    outputs so cross-engine hashes are exact."""
    toks = tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    total_len = F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    alnum = F.length(F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]", ""))
    chars = F.length(F.col(text_col))
    micro = lambda num, den: F.when(  # noqa: E731
        den > 0, F.round(num * F.lit(1_000_000.0) / den).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("mean_token_len_micro", micro(total_len, n_tok))
        .withColumn("stopword_ratio_micro", micro(stop_hits, n_tok))
        .withColumn("alnum_ratio_micro", micro(alnum, chars))
    )


def duckdb_quality_sql(text: str) -> dict[str, str]:
    toks = DUCKDB_TOKENS_SQL.format(col=text)
    all_stop = sorted({w for ws in STOPWORDS.values() for w in ws})
    ws = ", ".join(f"'{w}'" for w in all_stop)
    n_tok = f"len({toks})"
    total_len = f"list_sum(list_transform({toks}, t -> length(t)))"
    stop_hits = f"len(list_filter({toks}, t -> t IN ({ws})))"
    alnum = f"length(regexp_replace(lower({text}), '[^a-z0-9]', '', 'g'))"
    chars = f"length({text})"
    micro = (
        lambda num, den: f"CASE WHEN {den} > 0 THEN "
        f"CAST(round({num} * 1000000.0 / {den}) AS BIGINT) ELSE 0 END"
    )
    return {
        "n_tokens": f"CAST({n_tok} AS BIGINT)",
        "mean_token_len_micro": micro(f"COALESCE({total_len}, 0)", n_tok),
        "stopword_ratio_micro": micro(stop_hits, n_tok),
        "alnum_ratio_micro": micro(alnum, chars),
    }


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint:
    h = fold(tokens, h*31 + unicode(t[0])*7 + len(t)) mod 1e9+7.
    The engine analog of the reference's deterministic combinatorial
    hash key (``_Shazam_.py:258-261``) — content-derived, engine- and
    partitioning-independent."""
    toks = tokens_col(F.col(text_col))
    fp = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * FP_MULT + F.ascii(F.substring(t, 1, 1)) * 7 + F.length(t)
        ) % MOD,
    )
    return df.withColumn("fingerprint", fp)


def duckdb_fingerprint_sql(text: str) -> str:
    toks = DUCKDB_TOKENS_SQL.format(col=text)
    return (
        f"COALESCE(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({toks}, t -> CAST(unicode(t) * 7 + length(t) AS BIGINT))), "
        f"(acc, v) -> (acc * {FP_MULT} + v) % {MOD}), 0)"
    )


# BPE-ish pre-tokenizer pattern (GPT-2-style word/digit/punct runs,
# simplified to the regex subset Java regex and RE2 share): a letter
# run, a single digit, or a single non-alnum-non-space symbol. The
# count approximates subword-tokenizer token counts for budgeting
# training data — exact string math in both dialects.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 \\t\\n\\r]"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token-count features: whitespace-delimited word count and a
    BPE-ish subword count (letter runs + single digits + single
    symbols) — the budgeting pair a training-data pipeline reports per
    document. Pure column expressions, zero shuffle."""
    ws = F.size(
        F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    )
    bpe = F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN))
    return (
        df.withColumn("ws_tokens", ws.cast("long"))
        .withColumn("bpe_ish_tokens", bpe.cast("long"))
    )


def duckdb_token_counts_sql(text: str) -> dict[str, str]:
    return {
        "ws_tokens": (
            f"CAST(len(list_filter(regexp_split_to_array({text}, '\\s+'), "
            f"t -> t <> '')) AS BIGINT)"
        ),
        "bpe_ish_tokens": (
            f"CAST(len(regexp_extract_all({text}, "
            f"'{BPE_ISH_PATTERN}')) AS BIGINT)"
        ),
    }
