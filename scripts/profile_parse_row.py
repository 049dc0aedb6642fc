"""Single-process profile of the per-row parse work (r10 follow-up).

Builds bench-shaped page rows (testkit.page_row at the wide drain's
branching=50), then times the components of oracle.make_result_dict
separately and under cProfile — no Spark, no Arrow, so the numbers
isolate pure-Python parse cost. Run on a quiet machine.

    python scripts/profile_parse_row.py [n_rows]
"""

import cProfile
import io
import pstats
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark import canon, htmlex, oracle, testkit  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4000


def bench_rows(n):
    rows = []
    b = 50
    per_host = 51
    for k in range(n):
        host = f"bench-{k // per_host:04d}.test"
        pid = str(k % per_host) if k % per_host else ""
        r = testkit.page_row(host, pid, branching=b, sep=".")
        r["fetch_url"] = r["url"]
        rows.append(r)
    return rows


def main():
    rows = bench_rows(N)

    # warm caches/regexes
    for r in rows[:50]:
        oracle.make_result_dict(r["fetch_url"], 1, r)

    t0 = time.perf_counter()
    for r in rows:
        oracle.make_result_dict(r["fetch_url"], 1, r)
    t_full = time.perf_counter() - t0

    # component: extract only
    t0 = time.perf_counter()
    exs = [htmlex.extract_html(r["html"]) for r in rows]
    t_extract = time.perf_counter() - t0

    # component: resolve only (same call pattern as make_result_dict)
    t0 = time.perf_counter()
    nlinks = 0
    for r, ex in zip(rows, exs):
        addr = canon.make_address(r["fetch_url"])
        resolve = canon.make_resolver(addr["Full"])
        resolve(ex["CanonicalHref"])
        for href, lang in ex["Hreflang"]:
            resolve(href)
        for href, anchor, nofollow in ex["Links"]:
            resolve(href)
            nlinks += 1
    t_resolve = time.perf_counter() - t0

    # component: headers sort
    t0 = time.perf_counter()
    for r in rows:
        oracle._sorted_headers(r.get("headers"))
    t_headers = time.perf_counter() - t0

    print(f"rows={N} links={nlinks}")
    print(f"full make_result_dict: {t_full:.3f}s  ({t_full/N*1e6:.0f} us/row)")
    print(f"  extract_html       : {t_extract:.3f}s  ({t_extract/N*1e6:.0f} us/row)")
    print(f"  resolve+make_addr  : {t_resolve:.3f}s  ({t_resolve/N*1e6:.0f} us/row, {t_resolve/max(nlinks,1)*1e6:.2f} us/link)")
    print(f"  _sorted_headers    : {t_headers:.3f}s  ({t_headers/N*1e6:.0f} us/row)")
    print(f"  assembly (residual): {t_full-t_extract-t_resolve-t_headers:.3f}s")

    pr = cProfile.Profile()
    pr.enable()
    for r in rows:
        oracle.make_result_dict(r["fetch_url"], 1, r)
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(25)
    print(s.getvalue())


if __name__ == "__main__":
    main()
