"""Bare parse-stage probe (r10 follow-up): times engine._parse_map
over the 204k-row bench pages table in a clean Spark job — no crawl
machinery, so the number isolates (Arrow in + parse + Arrow out) and
is comparable across revisions on the same boot.

    python scripts/parse_stage_bench.py [reps]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 3
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main():
    from pyspark.sql import SparkSession

    from crawlspark import benchgen
    from crawlspark.engine import RESULT_FULL_SCHEMA, _apply_parse_stage
    from crawlspark.shipping import ensure_shipped

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ensure_shipped(spark)

    web_dir = os.path.join(tempfile.gettempdir(), "crawlscale-web-4000-50-1-3")
    if not os.path.exists(os.path.join(web_dir, "_SUCCESS")):
        benchgen.gen_pages(spark, 4000, 50, 1, 3).write.mode("overwrite").parquet(web_dir)
    import pyspark.sql.functions as F

    pages = (
        spark.read.parquet(web_dir)
        .repartition(96)
        .withColumn("fetch_url", F.col("url"))
        .withColumn("depth", F.lit(1).cast("long"))
        .withColumn("priority", F.lit(0).cast("int"))
        .withColumn("url_key", F.col("url"))
    )
    n = pages.count()

    out = _apply_parse_stage(pages, check_payload=False)
    # warm
    out.limit(2000).write.format("noop").mode("overwrite").save()
    walls = []
    for _ in range(REPS):
        t0 = time.time()
        out.write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 2))
    print({"rows": n, "walls": walls, "best": min(walls)})
    spark.stop()


if __name__ == "__main__":
    main()
