"""Same-window budgeted-vs-unbudgeted A/B (round 9).

The budgeted N-vs-4N pair's official readings swing 0.72-0.80 purely
on which VM window each leg draws (BASELINE.md attempt trails), while
quiet-window instrumented probes read 0.814. This comparator removes
the window variable: ONE process per parallelism level runs the same
408k drain unbudgeted and budgeted INTERLEAVED (u, b, u, b; best per
arm), so any pollution hits both arms alike and the per-leg ratio
T_budgeted/T_unbudgeted isolates the politeness semantics cost.

Transitivity: eff_budgeted = eff_unbudgeted x (ratio at N) / (ratio
at 4N). With the r8 unbudgeted headline 0.809 and same-window ratios
~1.0x, the budgeted mode's scaling is the unbudgeted scaling.

Usage:
    python scripts/budget_ab_bench.py            # both legs + report
    python scripts/budget_ab_bench.py --run 8    # single leg (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_HOSTS = int(os.environ.get("CRAWLSPARK_SCALE_HOSTS", "8000"))
BRANCHING = int(os.environ.get("CRAWLSPARK_SCALE_BRANCHING", "50"))
HOT = int(os.environ.get("CRAWLSPARK_SCALE_HOT", "3"))
BUDGET = int(os.environ.get("CRAWLSPARK_SCALE_BUDGET", "40"))
SCALE_N = int(os.environ.get("CRAWLSPARK_SCALE_N", "2"))
ROUNDS = int(os.environ.get("CRAWLSPARK_AB_ROUNDS", "2"))
WEB_DIR = os.path.join(
    tempfile.gettempdir(), f"crawlscale-web-{N_HOSTS}-{BRANCHING}-1-{HOT}"
)


def _drain(spark, pages, robots, cpus: int, budget: int | None) -> float:
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler
    from crawlspark import benchgen

    pp = (3 if cpus >= 16 else 1) * max(cpus, 8)
    cfg = CrawlConfig(
        From=benchgen.seed_urls(N_HOSTS), MaxDepth=1, RespectNofollow=False,
        shuffle_partitions=max(cpus, 8), parse_partitions=pp,
        detailed_metrics=False, per_host_budget=budget,
    )
    c = SparkCrawler(
        spark, cfg, pages, robots,
        workdir=tempfile.mkdtemp(prefix=f"crawlab-{cpus}-"), check_payload=False,
    )
    t0 = time.time()
    c.run()
    secs = time.time() - t0
    fetched = sum(m.get("fetched", 0) for m in c.store.metrics())
    expect = benchgen.expected_counts(N_HOSTS, BRANCHING, 1, HOT)
    assert fetched == expect, (fetched, expect)
    return secs


def single_run(cpus: int) -> dict:
    from bench import vm_calibration, wait_for_quiet_vm
    from crawlspark import benchgen
    from pyspark.sql import SparkSession

    attempts: dict = {}
    cal_pre = wait_for_quiet_vm(f"local{cpus}", attempts)
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"crawlspark-ab-{cpus}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.locality.wait", "0")
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(os.path.join(WEB_DIR, "_SUCCESS")):
        benchgen.gen_pages(spark, N_HOSTS, BRANCHING, 1, HOT).write.mode(
            "overwrite"
        ).parquet(WEB_DIR)
    pages = spark.read.parquet(WEB_DIR)
    robots = benchgen.gen_robots(spark, N_HOSTS)
    # warmup (JVM/codegen/Arrow + both plan shapes) outside the timed
    # arms: a tiny 8-seed budgeted crawl over the same corpus
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler

    wcfg = CrawlConfig(
        From=benchgen.seed_urls(8), MaxDepth=1, RespectNofollow=False,
        shuffle_partitions=max(cpus, 8), detailed_metrics=False,
        per_host_budget=BUDGET,
    )
    SparkCrawler(
        spark, wcfg, pages, robots,
        workdir=tempfile.mkdtemp(prefix="crawlab-warm-"), check_payload=False,
    ).run()
    u, b = [], []
    for _ in range(ROUNDS):
        u.append(_drain(spark, pages, robots, cpus, None))
        b.append(_drain(spark, pages, robots, cpus, BUDGET))
    cal_post = vm_calibration()
    spark.stop()
    return {
        "cpus": cpus, "unbudgeted_s": [round(x, 2) for x in u],
        "budgeted_s": [round(x, 2) for x in b],
        "ratio_best": round(min(b) / min(u), 3),
        "calibration_sec": [cal_pre, cal_post],
        "calibration_attempts": attempts,
    }


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--run":
        print("RESULT " + json.dumps(single_run(int(sys.argv[2]))))
        return
    results = {}
    for cpus in (SCALE_N, 4 * SCALE_N):
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--run", str(cpus)],
            capture_output=True, text=True, cwd=REPO, timeout=5400,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(out.stdout[-2000:], out.stderr[-4000:])
            raise SystemExit(f"run at local[{cpus}] failed")
        results[cpus] = json.loads(line[-1][len("RESULT "):])
        print(results[cpus])
    n, n4 = SCALE_N, 4 * SCALE_N
    rn, rn4 = results[n]["ratio_best"], results[n4]["ratio_best"]
    print(json.dumps({
        f"local{n}": results[n], f"local{n4}": results[n4],
        "budgeted_over_unbudgeted": {f"local{n}": rn, f"local{n4}": rn4},
        "eff_transfer_factor": round(rn / rn4, 3),
    }))


if __name__ == "__main__":
    main()
