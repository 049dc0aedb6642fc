"""spark-submit entry point (north_rule: `spark-submit --py-files` on
multi-executor clusters).

    ZIP=$(python -c "import sys; sys.path.insert(0,'.'); \
          from crawlspark.shipping import make_pyfiles_zip; print(make_pyfiles_zip())")
    spark-submit --master local[8] --py-files "$ZIP" \
        scripts/submit_crawl.py <config.json> [pages.parquet robots.parquet]

Runs the crawl against the given fixture web (or the built-in matrix
fixture) and prints per-wave metrics + the first result rows. The
SparkSession comes from spark-submit; crawlspark is imported from the
shipped --py-files zip, exactly as on a real cluster.
"""

import json
import sys

from pyspark.sql import SparkSession


def main():
    spark = SparkSession.builder.appName("crawlspark-submit").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # executors get --py-files automatically; make the DRIVER see the
    # same zips (client mode doesn't always extend driver sys.path)
    for p in spark.sparkContext.getConf().get("spark.submit.pyFiles", "").split(","):
        if p and p not in sys.path:
            sys.path.insert(0, p.removeprefix("file://"))

    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler

    with open(sys.argv[1]) as f:
        cfg = CrawlConfig.from_json(f.read())
    if len(sys.argv) >= 4:
        pages = spark.read.parquet(sys.argv[2])
        robots = spark.read.parquet(sys.argv[3])
    else:
        from crawlspark.testkit import matrix_site, pages_to_spark, robots_to_spark

        pages_pdf, robots_pdf, _ = matrix_site()
        pages = pages_to_spark(spark, pages_pdf)
        robots = robots_to_spark(spark, robots_pdf)

    # Kept-on-interrupt workdir, removed only after SUCCESS: an
    # atexit-cleaned scratch dir here (the ADVICE r02 anti-leak fix)
    # would also fire on Ctrl-C and destroy exactly the mid-wave
    # checkpoint run(resume=True) needs (code-review r04); an
    # explicit post-success rmtree keeps /tmp clean for completed
    # runs while an interrupted run preserves its snapshot store
    # (the kept path is printed by crawl_workdir).
    import shutil

    from crawlspark import scratch

    workdir = scratch.crawl_workdir()
    crawler = SparkCrawler(spark, cfg, pages, robots, workdir=workdir)
    crawler.run()
    print("METRICS " + json.dumps(crawler.store.metrics()))
    n = crawler.results().count()
    print(f"RESULTS {n}")
    for row in crawler.results().limit(3).collect():
        print("ROW", row["Depth"], row["Priority"], row["UrlKey"], row["StatusCode"])
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
