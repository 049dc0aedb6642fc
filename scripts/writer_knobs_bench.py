"""Hydrated-results writer-knob A/B (VERDICT r06 #3).

The wide wave's residual ~9 s is the parquet write of the hydrated
Result slice (200k rows x ~50 nested Link structs ~= 10M structs,
~1.4 GB raw strings) — the product path (crawl.go:147-150's NDJSON
emit analogue). This measures writer-side knobs that are NOT
semantics changes: compression codec, dictionary encoding, page
size. Method: run the wide drain once (untimed), then read its
staged results wave-1 slice back and re-write it under each config,
best-of-2, with a `noop`-sink leg isolating the read+decode cost
common to every config. Output bytes are recorded too — at 100 TB
the written-byte count is itself a first-order cost.

Usage: python scripts/writer_knobs_bench.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


CONFIGS = [
    # (label, writer options)
    ("snappy+dict (default)", {}),
    ("zstd", {"compression": "zstd"}),
    ("lz4", {"compression": "lz4"}),
    ("uncompressed", {"compression": "uncompressed"}),
    ("snappy, dictionary OFF", {"parquet.enable.dictionary": "false"}),
    ("zstd, 4M pages", {"compression": "zstd", "parquet.page.size": str(4 << 20)}),
]


def main():
    spark = bench.build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # one untimed wide drain to materialize the real hydrated slice
    from crawlspark import benchgen
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler

    web_dir = os.path.join(tempfile.gettempdir(), "crawlscale-web-4000-50-1-3")
    if not os.path.exists(os.path.join(web_dir, "_SUCCESS")):
        benchgen.gen_pages(spark, 4000, 50, 1, 3).write.mode("overwrite").parquet(web_dir)
    cfg = CrawlConfig(
        From=benchgen.seed_urls(4000), MaxDepth=1, RespectNofollow=False,
        shuffle_partitions=32, parse_partitions=96, detailed_metrics=False,
    )
    workdir = tempfile.mkdtemp(prefix="knobs-")
    crawler = SparkCrawler(
        spark, cfg, spark.read.parquet(web_dir), benchgen.gen_robots(spark, 4000),
        workdir=workdir, check_payload=False,
    )
    crawler.run()
    src = os.path.join(workdir, "results", "wave=1")
    df = spark.read.parquet(src)
    rows = df.count()
    print(f"slice: {rows} rows, {du(src) / 1e6:.0f} MB as written by the drain")

    def best2(fn):
        return min(fn() for _ in range(2))

    # read+decode baseline common to every rewrite leg
    def noop_leg():
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 2)

    base = best2(noop_leg)
    print(f"noop sink (read+decode only): {base} s")

    out = tempfile.mkdtemp(prefix="knobs-out-")
    results = []
    for label, opts in CONFIGS:
        dest = os.path.join(out, label.replace(" ", "_").replace(",", ""))

        def leg():
            t0 = time.time()
            w = df.write.mode("overwrite")
            for k, v in opts.items():
                w = w.option(k, v)
            w.parquet(dest)
            return round(time.time() - t0, 2)

        t = best2(leg)
        size = du(dest)
        results.append((label, t, round(t - base, 2), round(size / 1e6)))
        print(f"{label:28s} {t:6.2f} s  (write-only ~{t - base:5.2f})  {size / 1e6:7.0f} MB")

    print("\n| config | read+write s | write-only s | MB |")
    print("|---|---|---|---|")
    for label, t, w, mb in results:
        print(f"| {label} | {t} | {w} | {mb} |")
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(workdir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
