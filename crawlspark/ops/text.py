"""Text-analysis operators over a `documents(doc_id, text, lang,
source, n_chars)` table.

All-JVM where possible (token/quality/fingerprint are pure column
expressions with DuckDB-oracle SQL equivalents in __spark_entry__);
language-ID is an n-gram-profile scorer that genuinely needs Python
-> vectorized pandas UDF (Arrow-batched), oracle-checked against a
full SQL trigram-score recompute in the DuckDB twin.

Scale notes: every operator here is embarrassingly parallel (no
shuffle at all — narrow transformations over the scan), so they
pipeline inside WholeStageCodegen / one Arrow pass and scale linearly
with input splits.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["token_stats", "quality_score", "fingerprint", "langid", "pattern_stats"]

_WS = r"\s+"


def token_stats(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword count (4-char chunks of
    long tokens approximate a byte-level BPE budget)."""
    toks = F.split(F.trim("text"), _WS)
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.aggregate(
            toks, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4).cast("int")
        ).alias("n_subwords"),
    ).orderBy("doc_id")


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword
    ratio, mean token length — the usual pretraining-filter features."""
    toks = F.split(F.trim("text"), _WS)
    n_tok = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "and", "of", "to", "in", "is"))
    )
    punct = F.length("text") - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(punct / F.greatest(F.length("text"), F.lit(1)), 4).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(n_tok, F.lit(1)), 4).alias("stopword_ratio"),
        F.round(
            (F.length(F.regexp_replace("text", _WS, "")) / F.greatest(n_tok, F.lit(1))), 4
        ).alias("mean_token_len"),
    ).orderBy("doc_id")


def fingerprint(docs: DataFrame, k: int = 4, shingle_words: int = 3) -> DataFrame:
    """Document fingerprint: k smallest md5 hashes over word
    shingles (a k-min sketch — the winnowing-style rolling-hash
    fingerprint, expressed portably via md5 so the DuckDB oracle
    computes the identical value)."""
    # zip_with shingle build (see ops/dedup._shingles for why the
    # transform(sequence)-over-slice form is O(words²) per doc); the
    # md5 lambda here sees only gram elements, never the outer array
    from .dedup import _shingles

    shingles = F.transform(
        _shingles(shingle_words),
        lambda g: F.md5(F.encode(g, "utf-8")),
    )
    return docs.select(
        "doc_id",
        F.concat_ws(",", F.slice(F.array_sort(F.array_distinct(shingles)), 1, k)).alias(
            "fingerprint"
        ),
    ).orderBy("doc_id")


def pattern_stats(docs: DataFrame) -> DataFrame:
    """PII-ish pattern scan: per-doc counts of email-shaped tokens,
    URLs and digit runs — the filter features a pretraining pipeline
    uses to route documents to scrubbing. Patterns restricted to the
    regex subset Java (Spark) and RE2 (DuckDB) treat identically, so
    the oracle recomputes them exactly; narrow column expressions, no
    shuffle."""
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+")).alias("n_emails"),
        F.regexp_count("text", F.lit(r"https?://[^ \t\n]+")).alias("n_urls"),
        F.regexp_count("text", F.lit(r"[0-9]+")).alias("n_digit_runs"),
    ).orderBy("doc_id")


# --- language-ID: n-gram profile heuristic (pandas UDF, oracle via SQL recompute) ---

_PROFILES = {
    "en": [" th", "the", "he ", " an", "and", "nd ", " of", "of ", "ing", " to"],
    "es": [" de", "de ", " la", "la ", "os ", " el", "el ", "ión", " qu", "que"],
    "fr": [" de", "de ", " le", "le ", "es ", " la", "ent", " et", "et ", "ion"],
    "de": ["en ", " de", "der", "er ", "ie ", " di", "die", "ch ", "ein", "sch"],
}


def langid(docs: DataFrame) -> DataFrame:
    """Character-trigram profile scorer. On synthetic word-salad text
    this mostly says 'en'/'unknown' — the operator (not the
    classifier) is what the pipeline needs."""
    from ..shipping import ensure_shipped_df

    ensure_shipped_df(docs)

    @F.pandas_udf(T.StringType())
    def _lid(texts: pd.Series) -> pd.Series:
        def score(t: str) -> str:
            if not t:
                return "unknown"
            tl = t.lower()
            best, best_s = "unknown", 0
            for lang, grams in _PROFILES.items():
                s = sum(tl.count(g) for g in grams)
                if s > best_s:
                    best, best_s = lang, s
            return best

        return texts.map(score)

    return docs.select("doc_id", "lang", _lid(F.col("text")).alias("lang_pred")).orderBy(
        "doc_id"
    )
