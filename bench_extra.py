"""Per-leg isolation harness for the r10 optimization round (guide
§1.4): times individual headline/registry queries with the SAME
session config + warmup methodology as the frozen bench.py (count()
by default; --noop for a full-materialization noop sink), and dumps
`.explain("formatted")` for each leg to plans/<tag>/ so plan claims
in OPTIMIZATION_r10.md are reproducible. bench.py itself is FROZEN
for measurement — this file carries every extra number.

Usage:
  python bench_extra.py --sf /root/testdata/sf1.0 \
      --legs docs_minhash_lsh,docs_neardup_verified --reps 2 \
      --plans plans/r10 --plan-suffix before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def build_spark():
    from bench import build_spark as _bs

    return _bs(CPUS)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf1.0")
    ap.add_argument("--legs", required=True, help="comma-separated query names")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--noop", action="store_true", help="noop sink instead of count()")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("--plans", default=None, help="dir to write explain(formatted) files")
    ap.add_argument("--plan-suffix", default="plan")
    args = ap.parse_args()
    legs = args.legs.split(",")

    import __spark_entry__ as entry

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)
        for name in legs:
            df = qs[name](spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.plans, f"{name}_{args.plan_suffix}.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}", file=sys.stderr)

    # same warmup the frozen bench does: run each shape once at sf0.001
    if not args.no_warm:
        warm = "/root/testdata/sf0.001"
        for name in legs:
            try:
                qs[name](spark, warm).count()
            except Exception as e:
                print(f"warm {name}: {e}", file=sys.stderr)

    out = {}
    for name in legs:
        runs = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = {"best": min(runs), "runs": runs}
        print(f"{name}: best={min(runs)} runs={runs}", file=sys.stderr)
    print(json.dumps({"sf": args.sf, "noop": args.noop, "legs": out}))


if __name__ == "__main__":
    main()
