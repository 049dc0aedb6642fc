"""Snapshot the EXACT output of selected queries() entries at a given
sf dir as per-query md5 hashes (row-order-sensitive — every query ends
in a deterministic orderBy). Used by the r10 optimization round to
prove a restructured query computes the identical result at sf1.0,
where the DuckDB oracle gate (scripts/check_oracles.py) isn't run.

Usage:
  python scripts/snapshot_outputs.py <sf_dir> <out.json> [q1,q2,...]
  # run once before a change and once after; diff the JSON
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def row_repr(row) -> str:
    vals = []
    for v in row:
        if isinstance(v, float):
            vals.append(repr(v))  # full precision — bit-exactness required
        else:
            vals.append(str(v))
    return "\x1f".join(vals)


def main():
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None

    import __spark_entry__ as entry
    from bench import build_spark

    spark = build_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    names = only or list(qs)
    out = {}
    for name in names:
        df = qs[name](spark, sf_dir)
        h = hashlib.md5()
        n = 0
        cols = df.columns
        h.update(("|".join(cols)).encode())
        for row in df.collect():
            h.update(row_repr(row).encode())
            n += 1
        out[name] = {"rows": n, "md5": h.hexdigest()}
        print(f"{name}: rows={n} md5={out[name]['md5']}", file=sys.stderr)
    with open(out_path, "w") as f:
        json.dump({"sf": sf_dir, "queries": out}, f, indent=1, sort_keys=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
