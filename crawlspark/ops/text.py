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

from . import spread

__all__ = ["token_stats", "quality_score", "fingerprint", "langid",
           "pattern_stats", "redact_pii", "repetition_stats"]

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
    return spread(docs.select("doc_id", "text")).select(
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
    return spread(docs.select("doc_id", "text")).select(
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


def _lid_udf():
    """The language-ID pandas UDF itself — shared by ``langid`` and
    pipeline.training_corpus' inline filter (r10): the pipeline
    applies the prediction as a COLUMN on the kept corpus instead of
    joining ``langid``'s output frame back on doc_id (one Arrow pass,
    no join, no second evaluation of the kept subtree). Callers are
    responsible for ensure_shipped on their input frame."""

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

    return _lid


def langid(docs: DataFrame) -> DataFrame:
    """Character-trigram profile scorer. On synthetic word-salad text
    this mostly says 'en'/'unknown' — the operator (not the
    classifier) is what the pipeline needs."""
    from ..shipping import ensure_shipped_df

    ensure_shipped_df(docs)
    _lid = _lid_udf()
    return (
        spread(docs.select("doc_id", "lang", "text"))
        .select("doc_id", "lang", _lid(F.col("text")).alias("lang_pred"))
        .orderBy("doc_id")
    )


def redact_pii(docs: DataFrame) -> DataFrame:
    """The scrubbing stage pattern_stats routes documents to (r9):
    emails, URLs and phone-shaped digit runs replaced by typed
    placeholder tokens, every other column untouched. Order matters
    and is pinned by test: emails first (so a mailto-ish userinfo is
    not half-eaten by the URL rule), then URLs, then phones (so
    digits inside an already-scrubbed URL are gone before the loose
    phone pattern runs). Pure regexp_replace column expressions — no
    shuffle, no UDF, the same Java/RE2-portable regex subset as
    pattern_stats."""
    red = F.regexp_replace("text", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>")
    red = F.regexp_replace(red, r"https?://[^ \t\n]+", "<URL>")
    # phone class spells out RE2's \s ([ \t\n\f\r]) instead of Java's
    # \s (ADVICE r9 #1): Java additionally matches U+000B, so a
    # vertical tab inside a phone-like digit run would diverge from
    # the DuckDB oracle's identical regex chain. Same match set on
    # every byte both engines treat alike.
    red = F.regexp_replace(red, r"\+?[0-9][0-9()\- \t\n\f\r]{6,}[0-9]", "<PHONE>")
    return docs.withColumn("text", red)


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style intra-document repetition features (r9):

    * ``dup_line_frac`` — fraction of line-characters that live in a
      line occurring more than once in the doc (boilerplate /
      template pages score high);
    * ``top_bigram_frac`` — occurrences of the most frequent word
      bigram over all bigram occurrences (degenerate repeated-phrase
      text scores high).

    Shapes chosen for 100 TB: explode -> groupBy on the high-entropy
    (doc_id, line/gram) key with map-side partial aggregation — NEVER
    an array lambda that references the outer array (Catalyst
    re-evaluates it per element, the O(n^2) trap dedup._shingles
    documents); bigrams reuse the zip_with shingle builder. Docs with
    NULL/empty text keep a row with NULL fractions (left join from
    the id spine)."""
    from .dedup import _shingles

    base = spread(docs.select("doc_id", "text"))
    lines = base.select(
        "doc_id", F.explode(F.split("text", "\n")).alias("line")
    )
    per_line = lines.groupBy("doc_id", "line").agg(F.count("*").alias("c"))
    line_chars = (F.col("c") * F.length("line")).cast("double")
    dup = per_line.groupBy("doc_id").agg(
        F.round(
            F.sum(F.when(F.col("c") > 1, line_chars).otherwise(F.lit(0.0)))
            / F.greatest(F.sum(line_chars), F.lit(1.0)),
            4,
        ).alias("dup_line_frac")
    )
    grams = base.select("doc_id", F.explode(_shingles(2)).alias("g"))
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    top = per_gram.groupBy("doc_id").agg(
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac")
    )
    return (
        docs.select("doc_id")
        .join(dup, "doc_id", "left")
        .join(top, "doc_id", "left")
        .orderBy("doc_id")
    )
