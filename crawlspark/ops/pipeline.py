"""End-to-end training-data pipeline composition.

The individual operators (ops/text quality + language-ID, ops/dedup
near-dup materialization) are each oracle-checked standalone; this
module composes them in the order a real pretraining pipeline runs
them — cheap narrow filters FIRST, the expensive dedup LAST over the
reduced corpus — and the composition itself is oracle-checked as the
`docs_training_corpus` CORRECTNESS row (__spark_entry__.py).

Scale shape: the quality and language filters are narrow per-row
column expressions / one Arrow pass (no shuffle), so at 100 TB they
cut the corpus before the shingle shuffle and the band groupBy ever
see it — filter-then-dedup is orders of magnitude cheaper than
dedup-then-filter and is why the composition exists as an operator
instead of leaving users to stitch the stages themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import spread
from .dedup import dedup_materialize
from .text import _WS

__all__ = ["training_corpus", "decontaminate"]


def training_corpus(
    docs: DataFrame,
    min_tokens: int = 40,
    langs: tuple[str, ...] = ("en", "de"),
    n_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 2,
) -> DataFrame:
    """The surviving training corpus: docs with at least
    ``min_tokens`` whitespace tokens, language-ID'd into ``langs``,
    near-dup deduplicated (each cluster keeps its min-doc_id member).
    Returns (doc_id, source, n_chars_calc) like dedup_materialize.

    r10 shape: the filtered+language-ID'd corpus is spread to session
    parallelism (the langid Arrow UDF otherwise runs at the 1-2-split
    scan parallelism of a small table) and spilled ONCE to scratch
    parquet before the dedup. dedup_materialize consumes its input
    on two separate paths (the LSH pass materialized under cc_labels'
    persist, and the final survivor anti-join), so a lazy ``kept``
    re-ran the langid UDF + filter join per path — the spill runs
    them once and both paths read the (partition-parallel) spill.
    The language filter is the UDF applied as a COLUMN on the kept
    rows (same predictions, doc_id unique, so identical row set as
    the former join against langid()'s frame — language-ID still runs
    over the token-filtered subset only), and the spill carries just
    the columns the dedup stage reads (doc_id, text, source)."""
    from ..scratch import spill_and_reread
    from ..shipping import ensure_shipped_df
    from .text import _lid_udf

    ensure_shipped_df(docs)
    toks = F.split(F.trim("text"), _WS)
    kept = spread(
        docs.filter(F.size(toks) >= min_tokens).select("doc_id", "text", "source")
    )
    kept = (
        kept.withColumn("_lp", _lid_udf()(F.col("text")))
        .filter(F.col("_lp").isin(*langs))
        .drop("_lp")
    )
    kept = spill_and_reread(kept, "crawlspark-tcorpus-")
    return dedup_materialize(kept, n_perm, bands, shingle_words)


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_words: int = 8,
    min_hits: int = 1,
    spill: bool = False,
) -> DataFrame:
    """Benchmark decontamination (r9): drop every training doc that
    shares at least ``min_hits`` distinct ``shingle_words``-word
    shingles with ANY document in ``benchmark`` (any frame with a
    ``text`` column) — the standard n-gram-overlap rule for keeping
    eval/test data out of a pretraining corpus.

    Scale shape: the benchmark side is an eval set (thousands of
    rows, not billions) — its distinct shingle set is broadcast, so
    the corpus pays one shingle explode + broadcast hash join + a
    partial-count on the high-entropy doc_id key, and the final
    removal is an ids-only left_anti join (the dedup_materialize
    pattern). The corpus is never shuffled by content. Shingles
    reuse dedup._shingles (zip_with build — the documented immunity
    to the O(words^2) outer-array lambda trap).

    ``spill=True`` materializes the (tiny) contaminated-ids frame to
    a scratch parquet before the anti-join — REQUIRED when the
    result feeds a multi-branch lineage (e.g. the dedup pipeline
    reads its input 3+ times): a lazy result re-runs the shingle
    explode + overlap join once PER BRANCH (measured on the composed
    training-corpus pipeline at sf0.1: 6.5 s lazy vs 4.8 s spilled;
    the residual ~1.8 s is the one overlap pass itself, in family
    with the minhash leg's own shingle cost — the engine's
    spill_and_reread pattern, CLAUDE.md 'persist caches DATA, not
    the LOGICAL PLAN')."""
    from .dedup import _shingles

    grams = F.array_distinct(_shingles(shingle_words))
    bench_grams = F.broadcast(
        benchmark.select(F.explode(grams).alias("g")).distinct()
    )
    contaminated = (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", F.explode(grams).alias("g"))
        .join(bench_grams, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
        .filter(F.col("hits") >= min_hits)
        .select("doc_id")
    )
    if spill:
        from ..scratch import spill_and_reread

        contaminated = spill_and_reread(contaminated, "decontam")
    return docs.join(contaminated, "doc_id", "left_anti")
