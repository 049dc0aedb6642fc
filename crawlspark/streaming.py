"""Structured Streaming surface.

The reference is a batch tool (its level-synchronized BFS loop is the
batch-iterative analog the north rule asks for, SURVEY.md §2A), but a
production frontier pipeline wants streaming taps; these are the two
canonical ones, built on readStream/writeStream with watermarks:

- ``stream_crawl_monitor``: tail a crawl's results table as it is
  appended wave-by-wave and maintain per-(depth, status) counts —
  the `crawl.go:151-156` progress telemetry as a streaming query.
- ``stream_event_windows``: watermarked sliding-window aggregation
  over an event stream (late-data-safe counters).

Both accept a trigger/sink override; tests drive them with the
memory sink + processAllAvailable for deterministic completion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import RESULT_FULL_SCHEMA

__all__ = [
    "stream_crawl_monitor", "stream_event_windows", "stream_exact_dedup",
    "stateful_host_counter", "parquet_parts", "bump_sentinel_mtime", "drain",
]


def stream_crawl_monitor(
    spark: SparkSession,
    results_glob: str,
    query_name: str = "crawl_monitor",
    schema=None,
    max_files_per_trigger: int | None = None,
):
    """Streaming per-(Depth, StatusCode) counters over an appended
    results directory. Returns the StreamingQuery (memory sink).

    Complete mode is safe HERE because state cardinality is bounded
    by (max depth × distinct status codes) — a few hundred rows at
    any crawl scale — unlike time-windowed aggs, which must use
    append mode (see stream_event_windows)."""
    reader = spark.readStream.schema(schema or RESULT_FULL_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.option("pathGlobFilter", "*.parquet").parquet(results_glob)
    agg = stream.groupBy("Depth", "StatusCode").agg(
        F.count("*").alias("n"),
        F.count(F.when(F.col("Status") == "Blocked by robots.txt", 1)).alias("blocked"),
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_event_windows(
    spark: SparkSession,
    events_path: str,
    schema,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    query_name: str = "event_windows",
    max_files_per_trigger: int | None = None,
):
    """Watermarked sliding-window event counts in ``append`` output
    mode: a window's aggregate is emitted exactly once, when the
    watermark passes its end, and its state row is EVICTED at that
    point — so executor state is bounded by (windows in flight ×
    keys), not by stream length. (In ``complete`` mode a watermark
    evicts nothing; that mode is deliberately not used here.)

    The memory sink is the test/driver harness only — production
    would writeStream to files/Kafka. Finite file streams must push
    the watermark past the last window end for the final windows to
    finalize (e.g. by appending a sentinel row ``window + watermark``
    past the max event ts); Spark's no-data micro-batch then flushes
    the remaining finalized windows.

    `sum_value` accumulates pre-rounded integer cents, not doubles:
    double addition is non-associative, so partition order could
    otherwise flip the last rounded digit vs a batch/DuckDB twin.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.parquet(events_path)
    # watermarks need session-TZ TIMESTAMP (parquet may carry NTZ)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "event_type",
            "n",
            (F.col("cents") / F.lit(100.0)).alias("sum_value"),
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stream_exact_dedup(
    spark: SparkSession,
    docs_path: str,
    schema,
    watermark: str = "2 hours",
    query_name: str = "stream_dedup",
    max_files_per_trigger: int | None = None,
):
    """Streaming exact dedup: emit each distinct content hash's FIRST
    arrival, dropping later duplicates that arrive within the
    watermark (dropDuplicatesWithinWatermark — per-key state is
    EVICTED once the watermark passes its event time, so state is
    bounded by the distinct-key arrival rate × watermark, not by
    stream length). This is the streaming half of ops/dedup.
    exact_dedup: a training-data ingest pipeline dedups the firehose
    BEFORE it lands, then the batch near-dup pipeline handles the
    rest. Append mode: rows are final when emitted."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    from .ops.dedup import _md5  # the batch exact_dedup's hash, verbatim

    stream = reader.parquet(docs_path)
    stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = (
        stream.withColumn("content_hash", _md5(F.col("text")))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
        # WHICH duplicate row survives depends on partition/arrival
        # order (nondeterministic within a micro-batch); the distinct
        # hash SET is deterministic, so that is the contract
        .select("content_hash")
    )
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def stateful_host_counter(
    spark: SparkSession,
    results_glob: str,
    query_name: str = "host_counter",
    max_files_per_trigger: int = 1,
    schema=None,
):
    """Custom stateful operator (applyInPandasWithState): per-host
    cumulative fetched/blocked counters carried across micro-batches —
    the crawler's per-host politeness ledger as a streaming state
    machine. One state row per host; emits the running totals each
    batch the host appears in."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from .shipping import ensure_shipped

    ensure_shipped(spark)  # UDF-creating entry point; see shipping.py

    stream = (
        spark.readStream.schema(schema or RESULT_FULL_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .option("pathGlobFilter", "*.parquet")
        .parquet(results_glob)
    )
    keyed = stream.select(
        F.coalesce(F.col("Address.Host"), F.lit("")).alias("host"),
        (F.col("Status") == "Blocked by robots.txt").alias("blocked"),
    ).groupBy("host")

    out_schema = "host string, fetched long, blocked long, batches long"
    state_schema = "fetched long, blocked long, batches long"

    def update(key, pdfs, state):
        fetched, blocked, batches = state.get if state.exists else (0, 0, 0)
        for pdf in pdfs:
            blocked += int(pdf["blocked"].sum())
            fetched += int((~pdf["blocked"]).sum())
        batches += 1
        state.update((fetched, blocked, batches))
        yield pd.DataFrame(
            {"host": [key[0]], "fetched": [fetched], "blocked": [blocked], "batches": [batches]}
        )

    counted = keyed.applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    return (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def parquet_parts(path: str) -> list[str]:
    """Data part files of a parquet directory (no _SUCCESS/metadata)."""
    import os

    return sorted(
        os.path.join(path, f) for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def bump_sentinel_mtime(path: str, before: set[str], bump: float = 10.0) -> None:
    """FileStreamSource orders micro-batches by file MODIFICATION
    TIME: two back-to-back writes can land in the same timestamp
    granularity, which would let a watermark-flush sentinel process
    BEFORE the data it is meant to flush (dropping every real row as
    late). Explicitly set each new file's mtime past the existing
    files' max so the ordering is pinned, not accidental."""
    import os

    olds = [os.path.getmtime(p) for p in before] or [0.0]
    target = max(olds) + bump
    for p in parquet_parts(path):
        if p not in before:
            os.utime(p, (target, target))


def drain(query) -> DataFrame:
    """Drive a file-source streaming query to completion (tests)."""
    query.processAllAvailable()
    spark = SparkSession.getActiveSession()
    return spark.sql(f"SELECT * FROM {query.name}")
