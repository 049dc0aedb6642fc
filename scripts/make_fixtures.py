"""Generate the committed analysis fixtures:

- fixtures/crawl_results.parquet — the sequential oracle's output on
  the matrix fixture site (full nested Result schema + Priority/
  UrlKey). This is the `crawl` table the reference's BigQuery corpus
  (/root/reference/sql/*.sql) runs over; both __spark_entry__
  queries() and their DuckDB oracle_sql() read this same file, and
  tests/test_engine.py proves the Spark engine reproduces it.
- fixtures/images.parquet — input_hint image+caption corpus.

Deterministic (seed=42 fixtures); regenerate with
``python scripts/make_fixtures.py`` — the output is byte-stable.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from crawlspark import oracle, testkit
from crawlspark.config import CrawlConfig

ADDR = pa.struct(
    [("Full", pa.string()), ("Scheme", pa.string()), ("Opaque", pa.string()),
     ("Host", pa.string()), ("Path", pa.string()), ("Query", pa.string())]
)
PAIR = pa.struct([("K", pa.string()), ("V", pa.string())])
LINK = pa.struct(
    [("Address", ADDR), ("Anchor", pa.string()), ("Href", pa.string()), ("Nofollow", pa.bool_())]
)
HREFLANG = pa.struct([("Address", ADDR), ("Href", pa.string()), ("Hreflang", pa.string())])
CANONICAL = pa.struct([("Address", ADDR), ("Href", pa.string())])

CRAWL_SCHEMA = pa.schema(
    [
        ("Address", ADDR),
        ("Depth", pa.int64()),
        ("BodyTextHash", pa.string()),
        ("Description", pa.string()),
        ("Title", pa.string()),
        ("H1", pa.string()),
        ("Robots", pa.string()),
        ("Canonical", CANONICAL),
        ("Links", pa.list_(LINK)),
        ("Hreflang", pa.list_(HREFLANG)),
        ("Status", pa.string()),
        ("StatusCode", pa.int64()),
        ("Proto", pa.string()),
        ("ProtoMajor", pa.int64()),
        ("ProtoMinor", pa.int64()),
        ("Header", pa.list_(PAIR)),
        ("ResolvesTo", ADDR),
        ("Priority", pa.int32()),
        ("UrlKey", pa.string()),
    ]
)


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
    os.makedirs(out_dir, exist_ok=True)

    pages_pdf, robots_pdf, seeds = testkit.matrix_site()
    pages = {r["url"]: r for r in pages_pdf.to_dict("records")}
    rob = {
        (r["scheme"], r["host"]): (r["status_code"], r["body"])
        for r in robots_pdf.to_dict("records")
    }
    cfg = CrawlConfig(From=seeds, MaxDepth=3, RespectNofollow=False)
    results, seen, _ = oracle.crawl_oracle(cfg, pages, rob)

    rows = []
    for depth, priority, url_key, res in sorted(
        ((d, p, u, r) for d, p, u, r in results), key=lambda t: (t[0], t[1], t[2])
    ):
        row = dict(res)
        row["Priority"] = priority
        row["UrlKey"] = url_key
        rows.append(row)

    cols = {f.name: [r.get(f.name) for r in rows] for f in CRAWL_SCHEMA}
    table = pa.Table.from_pydict(cols, schema=CRAWL_SCHEMA)
    pq.write_table(table, os.path.join(out_dir, "crawl_results.parquet"), compression="snappy")
    print(f"crawl_results.parquet: {table.num_rows} rows, seen={len(seen)}")

    images = testkit.make_images(8)
    img_table = pa.Table.from_pandas(images, preserve_index=False)
    pq.write_table(img_table, os.path.join(out_dir, "images.parquet"), compression="snappy")
    print(f"images.parquet: {img_table.num_rows} rows")

    # sign-random-projection hyperplanes for ops/similarity.srp_ann —
    # committed so Spark and the DuckDB oracle share identical planes
    import numpy as np

    rng = np.random.RandomState(42)
    n_planes, n_dims = 6, 64
    w = rng.standard_normal((n_planes, n_dims))
    planes = pa.Table.from_pydict(
        {
            "plane": np.repeat(np.arange(n_planes, dtype=np.int32), n_dims),
            "dim": np.tile(np.arange(n_dims, dtype=np.int32), n_planes),
            "w": np.round(w.ravel(), 6),
        }
    )
    pq.write_table(planes, os.path.join(out_dir, "planes.parquet"), compression="snappy")
    print(f"planes.parquet: {planes.num_rows} rows")


if __name__ == "__main__":
    main()
