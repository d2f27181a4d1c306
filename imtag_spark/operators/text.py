"""Text analysis for training-data pipelines: token counts, quality scores,
language ID, fingerprinting.

All hot-path computation is JVM-side ``pyspark.sql.functions`` column
arithmetic (whole-stage codegen) — no Python in any per-row path. These are
the dataset-curation operators a 100 TB corpus pipeline runs ahead of the
graph stages; they follow the same design rule as the reference's scan pass
(reduce early, aggregate late).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-ratio language
# heuristic. Deliberately small and hard-coded: language ID here is a
# deterministic, dependency-free heuristic, not a model.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "que", "y", "es", "en", "un", "por", "con"],
}

PUNCT_CLASS = "[.,!?;:]"


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    ).cast("long")


def punct_count(text: Column) -> Column:
    return (F.length(text) - F.length(F.regexp_replace(text, PUNCT_CLASS, ""))).cast(
        "long"
    )


def upper_count(text: Column) -> Column:
    return (F.length(text) - F.length(F.regexp_replace(text, "[A-Z]", ""))).cast("long")


def with_doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach n_chars / n_tokens / punct_ratio / upper_ratio quality columns."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    return (
        docs.withColumn("n_chars_c", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "punct_ratio",
            F.round(punct_count(t) / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "upper_ratio",
            F.round(upper_count(t) / F.greatest(n_chars, F.lit(1)), 6),
        )
        .withColumn(
            "avg_token_len",
            F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6),
        )
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite [0,1] quality score: length band + punctuation sanity +
    casing sanity. Deterministic column arithmetic, tunable weights."""
    d = with_doc_stats(docs, text_col)
    len_ok = F.when((F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 100000), 1.0).otherwise(0.3)
    punct_ok = F.when(F.col("punct_ratio") <= 0.2, 1.0).otherwise(0.5)
    upper_ok = F.when(F.col("upper_ratio") <= 0.3, 1.0).otherwise(0.5)
    return d.withColumn(
        "quality", F.round(0.5 * len_ok + 0.25 * punct_ok + 0.25 * upper_ok, 6)
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-ratio language heuristic → (…, lang_guess, lang_score).

    Tokenizes once, counts hits per language via array intersection — all
    built-in higher-order functions, no UDF.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    d = docs.withColumn("_toks", toks)
    best_lang = None
    best_score = None
    for lang, words in STOPWORDS.items():
        hits = F.size(
            F.filter(F.col("_toks"), lambda x: x.isin(*words))  # noqa: B023
        )
        score = hits / F.greatest(F.size(F.col("_toks")), F.lit(1))
        if best_lang is None:
            best_lang, best_score = F.lit(lang), score
        else:
            cond = score > best_score
            best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
            best_score = F.when(cond, score).otherwise(best_score)
    return (
        d.withColumn("lang_guess", F.when(best_score > 0, best_lang).otherwise(F.lit("unknown")))
        .withColumn("lang_score", F.round(best_score, 6))
        .drop("_toks")
    )


def fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: exact sha256 + a normalized 64-bit content hash
    (case/whitespace-insensitive xxhash64 — the cheap near-exact key)."""
    t = F.col(text_col)
    normalized = F.regexp_replace(F.lower(t), r"\s+", " ")
    return docs.select(
        id_col,
        F.sha2(t, 256).alias("text_sha"),
        F.xxhash64(F.trim(normalized)).alias("norm_hash"),
    )
