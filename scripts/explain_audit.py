"""Regenerate the physical-plan audit behind PLANS.md: prints
`.explain("formatted")` for the headline plans so pushdown/pruning/
broadcast choices can be re-verified after changes."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from crawlspark import analysis
from crawlspark.ops import dedup, similarity

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    crawl = spark.read.parquet(os.path.join(REPO, "fixtures", "crawl_results.parquet"))
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    planes = spark.read.parquet(os.path.join(REPO, "fixtures", "planes.parquet"))

    for title, df in [
        ("noindex: nested-column pruning", analysis.noindex(crawl)),
        ("duplicate_title: broadcast self-join + pushdown", analysis.duplicate_title(crawl)),
        ("sf_emulation: windows + HOFs + left join", analysis.sf_emulation(crawl)),
        ("minhash signatures: 1x-gram shuffle, n_perm min columns", dedup.minhash_signatures(docs)),
        ("srp buckets: planes broadcast join-aggregate", similarity.srp_buckets(emb, planes)),
        (
            "ivf topk: broadcast centroid fan-out, bucket join (no cartesian)",
            similarity.ivf_topk(
                emb, spark.read.parquet(os.path.join(REPO, "fixtures", "centroids.parquet"))
            ),
        ),
        (
            "phash neardup: banded blocking (no CartesianProduct)",
            __import__("crawlspark.ops.multimodal", fromlist=["multimodal"]).phash_neardup(
                spark.read.parquet(os.path.join(REPO, "fixtures", "images.parquet"))
            ),
        ),
        (
            "tpch-style filter pushdown",
            spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
            .filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag")
            .agg(F.sum("l_quantity")),
        ),
    ]:
        print(f"\n{'=' * 70}\n== {title}\n{'=' * 70}")
        df.explain("formatted")


if __name__ == "__main__":
    main()
