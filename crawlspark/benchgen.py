"""Distributed synthetic-web generation for the bench tier
(FIXTURES.md scale knobs): N hosts (one hot host with a multiplied
branching factor — the skew-split exercise), each a digit-tree site
of depth `depth`, rendered with testkit.render_page inside
mapInPandas so generation itself scales with executors.

Deterministic: pages are a pure function of (host index, page id),
so the same parquet comes out at any parallelism — which also means
at 10^10-URL scale the corpus is *evidenced* by generation math, not
materialized (SURVEY.md §6).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import PAGE_SCHEMA, ROBOTS_FIXTURE_SCHEMA
from .testkit import page_row

__all__ = ["gen_pages", "gen_images", "gen_robots", "seed_urls", "expected_counts"]


def _host_name(k: int) -> str:
    return f"bench-{k:04d}.test"


def _branching(k: int, base: int, hot_factor: int) -> int:
    return base * hot_factor if k == 0 else base


def _page_ids(b: int, depth: int) -> list[str]:
    ids = [""]
    frontier = [""]
    for _ in range(depth):
        # dot-separated ids so branching factors >10 stay unambiguous
        frontier = [(f"{p}.{e}" if p else str(e)) for p in frontier for e in range(b)]
        ids.extend(frontier)
    return ids


def gen_pages(
    spark: SparkSession,
    n_hosts: int,
    base_branching: int = 10,
    depth: int = 2,
    hot_factor: int = 3,
    with_images: bool = False,
) -> DataFrame:
    """``with_images``: every non-seed page carries an
    ``image_id = host/pid`` reference into gen_images' corpus — the
    input_hint image+caption crawl at bench scale."""
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    hosts = spark.range(n_hosts).select(F.col("id").cast("int").alias("k"))
    hosts = hosts.repartition(min(n_hosts, 64))

    cols = [f.name for f in PAGE_SCHEMA.fields]

    def render(batches):
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                k = int(k)
                host = _host_name(k)
                b = _branching(k, base_branching, hot_factor)
                for pid in _page_ids(b, depth):
                    img = f"{host}/{pid}" if (with_images and pid) else None
                    rows.append(page_row(host, pid, branching=b, sep=".", image_id=img))
            out = pd.DataFrame(rows)
            for c in cols:
                if c not in out.columns:
                    out[c] = None
            yield out[cols]

    return hosts.mapInPandas(render, PAGE_SCHEMA)


def gen_images(
    spark: SparkSession,
    n_hosts: int,
    base_branching: int = 10,
    depth: int = 2,
    hot_factor: int = 3,
    w: int = 16,
    h: int = 16,
) -> DataFrame:
    """input_hint-shaped image+caption corpus matching
    gen_pages(with_images=True): one deterministic qjpg per non-seed
    page, synthesized inside mapInPandas so generation distributes
    exactly like the pages table."""
    from .schema import IMAGE_SCHEMA
    from .shipping import ensure_shipped

    ensure_shipped(spark)
    hosts = spark.range(n_hosts).select(F.col("id").cast("int").alias("k"))
    hosts = hosts.repartition(min(n_hosts, 64))
    cols = [f.name for f in IMAGE_SCHEMA.fields]

    def render(batches):
        from . import imagecodec

        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                k = int(k)
                host = _host_name(k)
                b = _branching(k, base_branching, hot_factor)
                for pid in _page_ids(b, depth):
                    if not pid:
                        continue
                    image_id = f"{host}/{pid}"
                    arr = imagecodec.synth_image(image_id, w, h)
                    rows.append(
                        {
                            "image_id": image_id,
                            "bytes": imagecodec.encode(arr, "qjpg"),
                            "w": w,
                            "h": h,
                            "fmt": "qjpg",
                            "caption": imagecodec.caption_for(image_id),
                            "phash": imagecodec.phash64(arr),
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return hosts.mapInPandas(render, IMAGE_SCHEMA)


def gen_robots(spark: SparkSession, n_hosts: int) -> DataFrame:
    rows = [
        (
            _host_name(k),
            "http",
            200,
            "User-agent: *\nDisallow: /private\n" if k % 7 else "User-agent: *\nAllow: /\n",
        )
        for k in range(n_hosts)
    ]
    return spark.createDataFrame(rows, ROBOTS_FIXTURE_SCHEMA)


def seed_urls(n_hosts: int) -> list[str]:
    return [f"http://{_host_name(k)}/" for k in range(n_hosts)]


def expected_counts(n_hosts: int, base_branching: int, depth: int, hot_factor: int) -> int:
    """Closed-form fetch count (RespectNofollow=False, allow-all
    robots): sum over hosts of the geometric tree series — the
    partition math that evidences larger scales without materializing
    them."""
    total = 0
    for k in range(n_hosts):
        b = _branching(k, base_branching, hot_factor)
        total += sum(b**d for d in range(depth + 1))
    return total
