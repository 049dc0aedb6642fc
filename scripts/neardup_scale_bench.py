"""Non-toy-scale probe for embedding_neardup_ivf (r10 continuation).

The fixture corpus is 2,000 vectors, where stage overhead dominates
every ANN number. This probe generates a deterministic synthetic
corpus (seeded per-id PCG vectors, dim 64) and k seeded centroids,
then times the r10 in-bucket scorer against a faithful inline
reconstruction of the pre-r10 shape (ids-only distinct candidate
pairs -> two vector fetch joins -> interpreted HOF cosine), asserting
row-set equality where both run.

    python scripts/neardup_scale_bench.py [n_small n_large]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
N_LARGE = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
DIM = 64
SEED = 20260822
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def gen_vectors(spark, n, tag):
    import pandas as pd

    from crawlspark.shipping import ensure_shipped

    ensure_shipped(spark)

    def render(batches):
        import numpy as np

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            vecs = [
                np.random.default_rng((SEED, int(i))).standard_normal(DIM).tolist()
                for i in ids
            ]
            yield pd.DataFrame({"vec_id": ids, "embedding": vecs})

    return (
        spark.range(n)
        .repartition(int(CPUS))
        .mapInPandas(render, "vec_id long, embedding array<double>")
    )


def old_shape(emb, centroids, threshold, n_probe):
    """Pre-r10 pipeline, reconstructed verbatim: ids-only distinct
    candidates, two fetch joins, interpreted HOF cosine."""
    from pyspark.sql import functions as F

    from crawlspark.ops import spread
    from crawlspark.ops.similarity import _cos_pre, _norm, ivf_assign_multi

    assign = ivf_assign_multi(emb, centroids, n_probe)
    pa, pb = assign.alias("pa"), assign.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.bucket") == F.col("pb.bucket"))
            & (F.col("pa.vec_id") < F.col("pb.vec_id")),
        )
        .select(F.col("pa.vec_id").alias("vec_a"), F.col("pb.vec_id").alias("vec_b"))
        .distinct()
    )
    e = spread(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).withColumn("n", _norm(F.col("v")))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    cos = _cos_pre(F.col("va"), F.col("na"), F.col("vb"), F.col("nb"))
    return (
        cand.join(a, "vec_a")
        .join(b, "vec_b")
        .select("vec_a", "vec_b", F.round(cos, 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
    )


def main():
    from pyspark.sql import SparkSession

    from crawlspark.ops import dedup

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for n, k, both in ((N_SMALL, max(N_SMALL // 100, 8), True),
                       (N_LARGE, max(N_LARGE // 100, 8), False)):
        emb = gen_vectors(spark, n, "emb")
        cents = (
            gen_vectors(spark, k, "cents")
            .selectExpr("vec_id as centroid_id", "embedding as center")
        )
        emb_p = emb.persist()
        cents_p = cents.persist()
        emb_p.count(); cents_p.count()
        new_df = dedup.embedding_neardup_ivf(emb_p, cents_p, threshold=0.9, n_probe=2)
        t0 = time.time()
        new_rows = new_df.collect()
        t_new = time.time() - t0
        line = {"n": n, "k": k, "new_s": round(t_new, 2), "pairs_out": len(new_rows)}
        if both:
            old_df = old_shape(emb_p, cents_p, threshold=0.9, n_probe=2)
            t0 = time.time()
            old_rows = old_df.collect()
            line["old_s"] = round(time.time() - t0, 2)
            line["rows_equal"] = sorted(map(tuple, new_rows)) == sorted(map(tuple, old_rows))
        print(line, flush=True)
        emb_p.unpersist(); cents_p.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
