"""Bench harness (driver contract): runs the headline workload at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Two components:
- crawl_engine: frontier-drain crawl over a distributed-generated
  synthetic web (benchgen) — the BASELINE.json headline (URLs
  fetched+deduped/sec recorded alongside as urls_per_sec).
- analysis/ops headline queries at the sf dir: TPC-H Q1, minhash-LSH
  dedup, brute-force + SRP ANN cosine top-k, quality scoring, and
  the crawl SQL corpus over the committed fixture.

Use scripts/scaling_bench.py for the N-vs-4N scaling-efficiency run
(local[8] vs local[32]) reported in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# bench-tier crawl sizing (FIXTURES.md): two drains —
#  deep: 50 hosts depth 2 (hot host 3x), 15.7k URLs over 3 waves
#        (exercises the BFS loop shape)
#  wide: 4000 hosts depth 1, 204k URLs over 2 waves (the throughput
#        headline; same corpus as scripts/scaling_bench.py)
N_HOSTS = int(os.environ.get("CRAWLSPARK_BENCH_HOSTS", "50"))
BRANCHING = int(os.environ.get("CRAWLSPARK_BENCH_BRANCHING", "16"))
DEPTH = int(os.environ.get("CRAWLSPARK_BENCH_DEPTH", "2"))
HOT = int(os.environ.get("CRAWLSPARK_BENCH_HOT", "3"))
WIDE_HOSTS = int(os.environ.get("CRAWLSPARK_BENCH_WIDE_HOSTS", "4000"))
WIDE_BRANCHING = int(os.environ.get("CRAWLSPARK_BENCH_WIDE_BRANCHING", "50"))
#  payload: 1000 hosts depth 1 with a qjpg image+caption on every
#           child page, decode+PSNR verified per row in the timed
#           parse (the input_hint crawl shape)
PAY_HOSTS = int(os.environ.get("CRAWLSPARK_BENCH_PAY_HOSTS", "1000"))
PAY_BRANCHING = int(os.environ.get("CRAWLSPARK_BENCH_PAY_BRANCHING", "50"))


def vm_calibration() -> float:
    """Single-core numpy burn (VERDICT r06 #1): a fixed deterministic
    workload timed OUTSIDE the crawl legs so any record can be
    normalized post-hoc against the VM's speed during THAT run. The
    r6 'crawl_deep regression' was this VM drifting: r5 code rerun on
    a quiet VM read 5.86-6.51 s best vs its 5.74 record, r6 code read
    5.95 — identical — while the official r6 record (9.98) was drawn
    in a slow window. Nominal on a quiet VM: ~0.36-0.40 s; scale
    recorded leg times by (nominal / observed) to compare rounds."""
    import numpy as np

    rng = np.random.default_rng(7)
    a = rng.random((512, 512))
    t0 = time.time()
    for _ in range(120):
        a = np.tanh(a @ a.T / 512.0)
    if not np.isfinite(a.sum()):  # keep the loop un-elidable
        raise AssertionError
    return round(time.time() - t0, 3)


CAL_NOMINAL = 0.38
CAL_FACTOR = float(os.environ.get("CRAWLSPARK_BENCH_CAL_FACTOR", "1.5"))
CAL_RETRIES = int(os.environ.get("CRAWLSPARK_BENCH_CAL_RETRIES", "8"))
CAL_SETTLE = float(os.environ.get("CRAWLSPARK_BENCH_CAL_SETTLE", "20"))


def wait_for_quiet_vm(tag: str, attempts_log: dict) -> float:
    """Calibration-gated settle policy (VERDICT r07 #1): never time a
    crawl leg through a known-polluted VM window. Burn the single-core
    calibration; while it reads > CAL_FACTOR x nominal, sleep
    CAL_SETTLE s and re-burn, up to CAL_RETRIES times. Every reading
    lands in the JSON under calibration_attempts[tag] — if the VM
    never goes quiet, the record carries its own proof instead of a
    silently slow leg. Returns the final reading."""
    readings = [vm_calibration()]
    while readings[-1] > CAL_NOMINAL * CAL_FACTOR and len(readings) <= CAL_RETRIES:
        time.sleep(CAL_SETTLE)
        readings.append(vm_calibration())
    attempts_log[tag] = readings
    return readings[-1]


def build_spark(cpus: str = CPUS):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("crawlspark-bench")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # split wide aggregates (16-min minhash) into small generated
        # methods: one Janino compile drops from ~7 s to ~1.7 s and the
        # sf0.001 shape warmup then covers it (measured, BENCH.md)
        .config("spark.sql.codegen.aggregate.splitAggregateFunc.enabled", "true")
        # local mode: every task is PROCESS_LOCAL — any locality wait is
        # pure scheduler idle time (measured ~10-15% on the wave-heavy
        # deep drain, which pays scheduling per wave)
        .config("spark.locality.wait", "0")
        # v2 output commit: tasks rename their own files, removing the
        # driver-serial per-file rename pass from every staged slice
        # (a per-sub-wave Amdahl term on budgeted waves, VERDICT r08
        # #2). Safe HERE by construction: the store's manifest commit
        # gates visibility, so v2's weaker failure atomicity (partial
        # task files left on abort) can never leak into a read.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def _payload_drain(spark, n_hosts, branching, hot) -> tuple[float, dict]:
    """The input_hint crawl at bench scale: every child page carries a
    qjpg image + caption; the parse map decodes each payload and
    checks PSNR>=40 vs the synthesized truth (check_payload=True —
    the per-row fidelity work is IN the timed path). Corpus
    generation is untimed."""
    import tempfile

    from crawlspark import benchgen
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler

    web_dir = os.path.join(
        tempfile.gettempdir(), f"crawlpay-web-{n_hosts}-{branching}-{hot}"
    )
    img_dir = os.path.join(
        tempfile.gettempdir(), f"crawlpay-img-{n_hosts}-{branching}-{hot}"
    )
    # images FIRST and both dirs gated on _SUCCESS: a kill between
    # the two writes must not leave a web_dir that skips regeneration
    # of a missing/partial img_dir (code-review r04)
    if not (os.path.exists(os.path.join(web_dir, "_SUCCESS"))
            and os.path.exists(os.path.join(img_dir, "_SUCCESS"))):
        benchgen.gen_images(spark, n_hosts, branching, 1, hot)\
            .write.mode("overwrite").parquet(img_dir)
        benchgen.gen_pages(spark, n_hosts, branching, 1, hot, with_images=True)\
            .write.mode("overwrite").parquet(web_dir)
    cfg = CrawlConfig(
        From=benchgen.seed_urls(n_hosts), MaxDepth=1, RespectNofollow=False,
        shuffle_partitions=max(int(CPUS), 8),
        parse_partitions=3 * max(int(CPUS), 8),
        detailed_metrics=False,
    )
    # The engine's lazy pages ⋈ images join is the right plan at THIS
    # scale: AQE broadcasts the 51k-row frontier so the fetch join
    # never shuffles at all. A/B-measured against a pre-materialized
    # bucketed (pages+image) corpus: lazy ~9.5 s vs bucketed ~10.5 s —
    # the forced sort-merge forgoes the broadcast. At 10^8+-row waves
    # the frontier stops broadcasting and the bucketed corpus wins
    # (PLANS.md payload row documents that deployment shape).
    crawler = SparkCrawler(
        spark, cfg, spark.read.parquet(web_dir),
        benchgen.gen_robots(spark, n_hosts),
        images_df=spark.read.parquet(img_dir),
        workdir=tempfile.mkdtemp(prefix="crawlpay-"), check_payload=True,
    )
    t0 = time.time()
    crawler.run()
    secs = time.time() - t0
    fetched = sum(m.get("fetched", 0) for m in crawler.store.metrics())
    ok = crawler.results().filter(
        "Payload IS NOT NULL AND Payload.PixelsOk"
    ).count()
    # caption equality (the input_hint's second per-row invariant):
    # emitted captions must match the source corpus exactly — checked
    # by an untimed join back against the images table
    from pyspark.sql import functions as F

    cap_ok = (
        crawler.results()
        .filter("Payload IS NOT NULL")
        .select(
            F.col("Payload.ImageId").alias("image_id"),
            F.col("Payload.Caption").alias("got"),
        )
        .join(spark.read.parquet(img_dir).select("image_id", "caption"), "image_id")
        .filter(F.col("got") == F.col("caption"))
        .count()
    )
    expected = benchgen.expected_counts(n_hosts, branching, 1, hot)
    assert fetched == expected, (fetched, expected)
    assert ok == expected - n_hosts, (ok, expected, n_hosts)  # every child verified
    assert cap_ok == ok, (cap_ok, ok)  # caption equality, row-by-row
    return secs, {
        "fetched": fetched,
        "payload_verified": ok,
        "urls_per_sec": round(fetched / secs, 1),
    }


def _drain(spark, n_hosts, branching, depth, hot, bucketed: bool = False) -> tuple[float, dict]:
    from crawlspark import benchgen
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler, bucketize_pages

    # materialize the synthetic web first — generation is not crawl time
    web_dir = os.path.join(
        tempfile.gettempdir(), f"crawlscale-web-{n_hosts}-{branching}-{depth}-{hot}"
    )
    if not os.path.exists(os.path.join(web_dir, "_SUCCESS")):
        benchgen.gen_pages(spark, n_hosts, branching, depth, hot).write.mode(
            "overwrite"
        ).parquet(web_dir)
    pages_df = spark.read.parquet(web_dir)
    if bucketed:
        # persist the corpus bucketed+sorted on the join key (untimed —
        # a one-time layout cost amortized over every wave's fetch join)
        pages_df = bucketize_pages(
            spark, pages_df, f"pages_bench_{n_hosts}_{branching}", buckets=32
        )
    robots_df = benchgen.gen_robots(spark, n_hosts)
    cfg = CrawlConfig(
        From=benchgen.seed_urls(n_hosts),
        MaxDepth=depth,
        RespectNofollow=False,
        shuffle_partitions=max(int(CPUS), 8),
        parse_partitions=3 * max(int(CPUS), 8),
        detailed_metrics=False,
    )
    crawler = SparkCrawler(
        spark, cfg, pages_df, robots_df,
        workdir=tempfile.mkdtemp(prefix="crawlbench-"), check_payload=False,
    )
    t0 = time.time()
    crawler.run()
    secs = time.time() - t0
    fetched = sum(m.get("fetched", 0) for m in crawler.store.metrics())
    expected = benchgen.expected_counts(n_hosts, branching, depth, hot)
    assert fetched == expected, f"crawl fetched {fetched} != closed-form {expected}"
    return secs, {"fetched": fetched, "urls_per_sec": round(fetched / secs, 1)}


def bench_crawl(spark, attempts_log: dict) -> tuple[float, dict, float, dict, float, dict, dict]:
    # untimed warmup: spins up the JVM codegen paths + reusable Python
    # workers so the timed drains measure steady-state crawl throughput,
    # not one-time process startup (the deep drain is only ~10 s of
    # work — a cold first wave was adding ~50% to it). The second,
    # depth-2 mini-drain covers the multi-wave plan shapes (seen
    # anti-join over 2 slices, wave-3 frontier) the 1-wave warmup
    # misses — measured another ~2 s of first-run cost otherwise
    # landing inside the timed deep drain.
    _drain(spark, 2, 2, 1, 1)
    _drain(spark, 6, 4, 2, 2)
    # Crawl legs are best-of-3, queries best-of-2 (VERDICT r05 #1 +
    # r06 #1/#2): this VM's shared ±20-30% envelope made single-shot
    # r5 legs read as regressions, and r6 showed successive drain runs
    # warm DOWN ~8.8 -> 5.9 s within a session (JIT) — best-of-2's
    # two samples can both land on the warm-up slope. All samples are
    # emitted in the JSON (key "samples") for audit.
    def _best2(fn, n=2):
        runs = [fn() for _ in range(n)]
        best = min(runs, key=lambda t: t[0])
        return best[0], best[1], [round(r[0], 3) for r in runs]

    # calibration gate before EVERY timed crawl leg (VERDICT r07 #1):
    # the wide <=18 s sub-target missed two straight rounds purely on
    # polluted VM windows (clean-run 17.13 vs records 19.66/19.51) —
    # settle+retry until the single-core burn reads quiet, with the
    # full attempt trail in the JSON either way
    wait_for_quiet_vm("crawl_deep", attempts_log)
    deep_secs, deep, deep_samples = _best2(
        lambda: _drain(spark, N_HOSTS, BRANCHING, DEPTH, HOT), n=3
    )
    # bucketed pages layout is the documented 100 TB deployment shape
    # (PLANS.md fetch-join row): one-time untimed layout cost, every
    # wave's fetch join then shuffles only the frontier side.
    # Measured: wide 5411 -> 7439 URLs/s. CRAWLSPARK_BENCH_BUCKETED=0
    # opts out (plain parquet corpus).
    bucketed = os.environ.get("CRAWLSPARK_BENCH_BUCKETED", "1") != "0"
    wait_for_quiet_vm("crawl_wide", attempts_log)
    wide_secs, wide, wide_samples = _best2(
        lambda: _drain(spark, WIDE_HOSTS, WIDE_BRANCHING, 1, HOT, bucketed=bucketed),
        n=3,
    )
    wait_for_quiet_vm("crawl_payload", attempts_log)
    pay_secs, pay, pay_samples = _best2(
        lambda: _payload_drain(spark, PAY_HOSTS, PAY_BRANCHING, HOT), n=3
    )
    samples = {
        "crawl_deep": deep_samples,
        "crawl_wide": wide_samples,
        "crawl_payload": pay_samples,
    }
    return deep_secs, deep, wide_secs, wide, pay_secs, pay, samples


HEADLINE = [
    "crawl_sf_emulation",
    "crawl_inlinks",
    "tpch_q1_pricing",
    "orders_region_topk",
    "docs_text_metrics",
    "docs_minhash_lsh",
    "docs_exact_dedup",
    # the composed dedup pipelines a real user runs (VERDICT r03 #6):
    # LSH recall -> exact-Jaccard precision, cluster -> materialize,
    # and the full filter+dedup training-corpus composition
    "docs_neardup_verified",
    "docs_dedup_materialize",
    "docs_training_corpus",
    "emb_cosine_topk",
    "emb_srp_ann_topk",
    "emb_ivf_topk",
    "images_phash_neardup",
]


def bench_queries(spark) -> dict[str, float]:
    import __spark_entry__ as entry

    # drop any cached/persisted frames the crawl section left behind so
    # query timings measure the queries, not leftover memory pressure
    spark.catalog.clearCache()
    qs = entry.queries()
    # warm each query SHAPE once at the tiny sf (untimed): whole-stage
    # codegen compiles the generated code on first execution. All
    # shapes now transfer across sf — r2's "minhash warmup doesn't
    # transfer" was misdiagnosed as a plan-variant issue; it was an
    # O(words²)-per-doc shingle expression (fixed, ops/dedup._shingles)
    # whose cost scaled with data and so LOOKED like a non-transferring
    # constant. The timed numbers below are honest steady-state.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(SF_DIR):
        for name in HEADLINE:
            try:
                qs[name](spark, warm_dir).count()
            except Exception:
                pass
    # best-of-2 per query (VERDICT r05 #1): a single hot-VM sample
    # drifted ALL steady-state queries +30-60% in the r5 driver run.
    # Two timed runs each (~20 s added total), best kept, both
    # samples returned for the audit trail.
    out: dict = {"_samples": {}}
    for name in HEADLINE:
        runs = []
        n = 0
        for _ in range(2):
            t0 = time.time()
            n = qs[name](spark, SF_DIR).count()
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        out[f"{name}_rows"] = n
        out["_samples"][name] = runs
    return out


# the driver captures only the TAIL of stdout (~2,000 chars) — r8's
# line hit 2,218 once the calibration_attempts trail landed and the
# driver recorded `parsed: null` (VERDICT r08 #1). Hard budget with
# slack; full detail goes to the sidecar below.
LINE_MAX = 1800
DETAIL_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench", "BENCH_DETAIL.json"
)


def emit(result: dict, detail_path: str = DETAIL_PATH) -> str:
    """Split the bench record into the ONE compact stdout JSON line
    (driver contract: < LINE_MAX chars so the driver's tail capture
    parses it) and a full-detail sidecar file. The line keeps every
    graded number (value/queries/urls_per_sec/calibration_sec) plus a
    per-leg [first, last, n] summary of the settle-gate attempt trail;
    the sidecar keeps the complete trails, per-leg samples, row counts
    and the long metric description."""
    detail_keys = ("samples", "calibration_attempts", "rows", "metric")
    detail = {k: result[k] for k in detail_keys if k in result}
    line_rec = {k: v for k, v in result.items() if k not in detail_keys}
    line_rec["metric"] = result.get("metric", "").split(" (")[0]
    line_rec["calibration_attempts"] = {
        tag: ([r[0], r[-1], len(r)] if r else [])
        for tag, r in result.get("calibration_attempts", {}).items()
    }
    os.makedirs(os.path.dirname(detail_path), exist_ok=True)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    line_rec["detail"] = os.path.relpath(
        detail_path, os.path.dirname(os.path.abspath(__file__))
    )
    line = json.dumps(line_rec)
    # emergency pruning, least-graded keys first — never the queries
    # or the headline value
    for k in ("detail", "calibration_attempts", "rows"):
        if len(line) <= LINE_MAX:
            break
        line_rec.pop(k, None)
        line = json.dumps(line_rec)
    assert len(line) <= LINE_MAX, (len(line), "bench line over driver budget")
    return line


def main():
    attempts_log: dict = {}
    cal_pre = wait_for_quiet_vm("pre", attempts_log)
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    deep_secs, deep, wide_secs, wide, pay_secs, pay, crawl_samples = bench_crawl(
        spark, attempts_log
    )
    # fresh JVM for the query section: a 400k-URL crawl leaves the
    # executor heap GC-pressured, which measured a ~4x slowdown on the
    # heaviest pure-JVM query (minhash 1.1 s fresh vs 4.3 s after a
    # drain in the same session) — that's harness aftermath, not query
    # cost, so the two workloads get separate sessions
    spark.stop()
    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qtimes = bench_queries(spark)
    cal_post = vm_calibration()

    query_samples = qtimes.pop("_samples")
    query_secs = {k: v for k, v in qtimes.items() if not k.endswith("_rows")}
    total = round(deep_secs + wide_secs + pay_secs + sum(query_secs.values()), 3)
    result = {
        "metric": "crawl+analysis wall seconds (crawl_deep = "
        f"{deep['fetched']}-URL depth-{DEPTH} BFS; crawl_wide = "
        f"{wide['fetched']}-URL frontier drain; crawl_payload = "
        f"{pay['fetched']}-URL image+caption crawl, "
        f"{pay['payload_verified']} payloads decoded+PSNR-verified)",
        "value": total,
        "unit": "sec",
        "queries": {
            "crawl_deep": round(deep_secs, 3),
            "crawl_wide": round(wide_secs, 3),
            "crawl_payload": round(pay_secs, 3),
            **query_secs,
        },
        "sf": SF_DIR,
        "urls_per_sec": wide["urls_per_sec"],
        "urls_per_sec_deep": deep["urls_per_sec"],
        "urls_per_sec_payload": pay["urls_per_sec"],
        "payload_verified": pay["payload_verified"],
        "cpus": int(CPUS),
        "rows": {k[:-5]: v for k, v in qtimes.items() if k.endswith("_rows")},
        "samples": {**crawl_samples, **query_samples},
        # single-core numpy burn before the crawl legs / after the
        # queries; nominal ~0.36-0.40 s on a quiet VM (vm_calibration
        # docstring) — normalize leg times by (nominal / observed)
        "calibration_sec": [cal_pre, cal_post],
        "calibration_nominal_sec": CAL_NOMINAL,
        # settle/retry trail (VERDICT r07 #1): every calibration burn
        # taken while gating the legs — "pre" plus one list per crawl
        # leg; a leg timed after an un-quiet trail is self-evident here
        "calibration_attempts": attempts_log,
    }
    print(emit(result))


if __name__ == "__main__":
    main()
