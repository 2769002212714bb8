"""Text-analysis operators over ``documents(doc_id, text, lang, source,
n_chars)`` — language-ID, quality scoring, token counting, document
fingerprinting.  All JVM-native (no UDFs): every expression lives in
whole-stage codegen and pushes column pruning down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
EN_STOP = ["the", "and", "of", "to", "in", "is", "that", "with", "for", "on"]
ES_STOP = ["el", "la", "de", "que", "y", "los", "en", "un", "por", "con"]
DE_STOP = ["der", "die", "und", "das", "ist", "von", "mit", "ein", "zu", "den"]
FR_STOP = ["le", "la", "et", "les", "des", "est", "dans", "que", "pour", "une"]


def _tokens(col):
    from ..functions import tokens_col

    return tokens_col(col)


def _stop_hits(tokens, stops: list[str]):
    lit = F.array(*[F.lit(s) for s in stops])
    return F.size(F.array_intersect(F.array_distinct(tokens), lit))


def token_stats(documents: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish subword estimate per doc."""
    toks = F.split(F.trim("text"), r"\s+")
    return documents.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        # BPE-ish proxy: ~1 token per 4 chars, floor at word count
        F.greatest(
            F.size(toks), F.ceil(F.length("text") / F.lit(4)).cast("int")
        ).alias("n_subwords_est"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals, combined
    into a [0,1] score (higher = keep for training)."""
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks)
    stop_ratio = _stop_hits(toks, EN_STOP) / F.greatest(n_tok, F.lit(1))
    punct = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    ) / F.greatest(F.length("text"), F.lit(1))
    len_score = F.least(F.length("text") / F.lit(500.0), F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.4) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct * 4.0, F.lit(1.0)))
    )
    return documents.select(
        "doc_id",
        F.round(len_score, 6).alias("len_score"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-vote language heuristic (en/es/de/fr, 'und' = unknown)."""
    toks = _tokens(F.col("text"))
    en, es, de, fr = (
        _stop_hits(toks, EN_STOP), _stop_hits(toks, ES_STOP),
        _stop_hits(toks, DE_STOP), _stop_hits(toks, FR_STOP),
    )
    best = F.greatest(en, es, de, fr)
    pred = (
        F.when(best == F.lit(0), F.lit("und"))
        .when(en == best, F.lit("en"))     # deterministic tie-break order
        .when(es == best, F.lit("es"))
        .when(de == best, F.lit("de"))
        .otherwise(F.lit("fr"))
    )
    return documents.select(
        "doc_id", F.col("lang").alias("lang_actual"), pred.alias("lang_pred")
    )


def fingerprints(documents: DataFrame) -> DataFrame:
    """Normalization-invariant document fingerprint (md5 of collapsed
    lowercase alnum text) — the exact-dedup key."""
    norm = F.trim(F.lower(F.regexp_replace("text", "[^a-zA-Z0-9]+", " ")))
    return documents.select("doc_id", F.md5(norm).alias("fingerprint"))
