"""Round-7 crawl_deep diagnosis (VERDICT r06 #1).

Reruns the deep drain (50 hosts x 16 branching, depth 2, hot x3 =
15,730 URLs over 3 waves) in ISOLATION — fresh JVM, same warmups as
bench.py, N timed runs — to establish whether the r6 official record
(9.98 s best-of-2) reproduces on a quiet VM or was load noise.

Usage: python scripts/deep_diag.py [n_runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = bench.build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    # identical untimed warmups to bench.py
    bench._drain(spark, 2, 2, 1, 1)
    bench._drain(spark, 6, 4, 2, 2)
    samples = []
    for i in range(n):
        t0 = time.time()
        secs, info = bench._drain(
            spark, bench.N_HOSTS, bench.BRANCHING, bench.DEPTH, bench.HOT
        )
        samples.append(round(secs, 3))
        print(f"run {i + 1}: {secs:.3f} s  ({info['urls_per_sec']} URLs/s)",
              flush=True)
    print(f"samples={samples} best={min(samples)} median="
          f"{sorted(samples)[len(samples) // 2]}")
    spark.stop()


if __name__ == "__main__":
    main()
