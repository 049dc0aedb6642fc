"""Measure the wide drain's parse-stage core-seconds (VERDICT r04 #3
evidence tool).

Wraps engine._parse_map with a timing shim that accumulates, per
Arrow batch, the wall time each executor thread spends inside the
parse generator (row loop + Arrow in/out for that batch) into a Spark
accumulator, then runs the bench wide drain (4000 hosts x 50
children, 204,100 URLs) exactly as bench.py does (bucketed pages,
untimed warmup). Run it on two revisions with the SAME shim to
compare parse cost honestly:

    python scripts/measure_parse_core.py [n_hosts branching]

Prints one JSON line: {"wall_secs", "parse_core_secs", "rows",
"us_per_row"}.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_HOSTS = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
BRANCHING = int(sys.argv[2]) if len(sys.argv) > 2 else 50
HOT = 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession

    import crawlspark.engine as E
    from crawlspark import benchgen
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler, bucketize_pages

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("parse-core-measure")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.locality.wait", "0")
        .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    acc = spark.sparkContext.accumulator(0.0)
    orig = E._parse_map_arrow  # r10: the production parse is the columnar map

    def timed_parse_map(check_payload, blocked_counter=None):
        inner = orig(check_payload, blocked_counter)

        def fn(batches):
            t0 = time.time()
            for out in inner(batches):
                acc.add(time.time() - t0)
                yield out
                t0 = time.time()

        return fn

    E._parse_map_arrow = timed_parse_map

    web_dir = os.path.join(
        tempfile.gettempdir(), f"crawlscale-web-{N_HOSTS}-{BRANCHING}-1-{HOT}"
    )
    if not os.path.exists(os.path.join(web_dir, "_SUCCESS")):
        benchgen.gen_pages(spark, N_HOSTS, BRANCHING, 1, HOT).write.mode(
            "overwrite"
        ).parquet(web_dir)
    pages_df = bucketize_pages(
        spark,
        spark.read.parquet(web_dir),
        f"pages_bench_{N_HOSTS}_{BRANCHING}",
        buckets=32,
    )
    robots_df = benchgen.gen_robots(spark, N_HOSTS)
    cfg = CrawlConfig(
        From=benchgen.seed_urls(N_HOSTS),
        MaxDepth=1,
        RespectNofollow=False,
        shuffle_partitions=max(int(CPUS), 8),
        parse_partitions=3 * max(int(CPUS), 8),
        detailed_metrics=False,
    )
    # untimed warmup (JVM codegen + Python workers), same as bench.py
    for wh, wb in ((2, 2), (6, 4)):
        wweb = os.path.join(tempfile.gettempdir(), f"crawlscale-web-{wh}-{wb}-1-1")
        if not os.path.exists(os.path.join(wweb, "_SUCCESS")):
            benchgen.gen_pages(spark, wh, wb, 1, 1).write.mode("overwrite").parquet(wweb)
        wcfg = CrawlConfig(From=benchgen.seed_urls(wh), MaxDepth=1,
                           RespectNofollow=False, detailed_metrics=False)
        SparkCrawler(
            spark, wcfg, spark.read.parquet(wweb), benchgen.gen_robots(spark, wh),
            workdir=tempfile.mkdtemp(prefix="crawlmeas-warm-"), check_payload=False,
        ).run()
    warm_core = acc.value  # warmup contributions subtracted below

    crawler = SparkCrawler(
        spark, cfg, pages_df, robots_df,
        workdir=tempfile.mkdtemp(prefix="crawlmeas-"), check_payload=False,
    )
    t0 = time.time()
    crawler.run()
    wall = time.time() - t0
    rows = sum(m.get("fetched", 0) for m in crawler.store.metrics())
    core = acc.value - warm_core
    print(json.dumps({
        "wall_secs": round(wall, 2),
        "parse_core_secs": round(core, 1),
        "rows": rows,
        "us_per_row": round(core / rows * 1e6, 0),
    }))


if __name__ == "__main__":
    main()
