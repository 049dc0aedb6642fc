"""Large-scale training-data-pipeline operators (build brief §ops):
deduplication (exact / minhash-LSH / n-gram Jaccard / simhash /
embedding cosine), similarity search (brute-force + LSH-bucketed
ANN), text analysis (token stats, quality, language-ID,
fingerprinting), and multimodal (image decode/feature) operators —
all DataFrame-first, Arrow-batched where Python is unavoidable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Repartition a narrow frame up to the session's default
    parallelism before CPU-heavy per-row work (optimization guide §2:
    partitioning must be scale-adaptive, derived from the cluster,
    never a local constant).

    Why it exists (r10): a small parquet table reads as 1-2 input
    splits (`spark.sql.files.maxPartitionBytes` >> file size), and
    every narrow transformation chained on the scan — shingle
    building, per-gram md5, HOF dot products, Arrow UDFs — runs in
    the SCAN stage at that parallelism. Measured at sf1.0 on
    local[32]: the minhash gram stage ran on 2 of 32 cores (3.2 s
    noop for the explode alone); cosine_topk dropped 2.88 -> 0.66 s
    from this one change. At real scale scans already have >= one
    split per core and this is a no-op by construction (it only ever
    RAISES the partition count to defaultParallelism).

    A keyless repartition is a round-robin exchange: rows-balanced
    (exactly what a CPU-bound stage wants), deterministic under
    retries (spark.sql.execution.sortBeforeRepartition, default on),
    and it moves the narrow projected columns once. Callers should
    .select(...) the needed columns first so the exchange carries
    only them (guide §2.3 "project before the exchange")."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
