"""Deterministic fixture generation (FIXTURES.md): the synthetic
fetchable web (`pages`), per-host robots, image+caption corpus, seed
lists, canonicalization goldens.

Everything is a pure function of (host, page id, seed=42): the same
rows come out of the pandas generator here, the Spark distributed
generator in bench.py (mapInPandas over id ranges), and the oracle's
dict lookups. Mirrors the reference's httptest fixture site
(/root/reference/crawler/testdata/nice_page.html and
server_test.go:61-116): every page links to children 0..B-1, odd
children rel=nofollow, so with RespectNofollow and MaxDepth=3 the
crawl emits exactly 1 + 5 + 25 + 125 = 156 rows at branching 10.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import imagecodec

__all__ = [
    "render_page", "page_row", "nice_site", "matrix_site",
    "make_images", "pages_to_spark", "SITE_HOST",
]

SITE_HOST = "site-0.test"
CANON_HOST = "www.example.com"


def render_page(host: str, pid: str, branching: int = 10, extra_links=(), sep: str = "") -> str:
    """nice_page.html-shaped body for page `pid` on `host`. ``sep``
    joins child ids (bench uses "." so branching factors >10 stay
    unambiguous; "" preserves the reference fixture's digit-concat)."""

    def child_id(e: int) -> str:
        return f"{pid}{sep}{e}" if pid else str(e)

    children = "".join(
        f'  <a href="/{child_id(e)}" rel="{"nofollow" if e % 2 == 1 else ""}">Child {e}</a>\n'
        for e in range(branching)
    )
    extras = "".join(f'  <a href="{href}">{anchor}</a>\n' for href, anchor in extra_links)
    return f"""<!DOCTYPE html>
<html lang="en">
<head>
<title>{pid or "root"}</title>
<meta name="description" content="My description." />
<meta name="robots" content="index, follow" />
<link rel="canonical" href="http://{CANON_HOST}/{pid}" />
<link rel="alternate" href="/{pid}" hreflang="en-us" />
<link rel="alternate" href="/{pid}" hreflang="en" />
<link rel="alternate" href="/{pid}" hreflang="x-default" />
</head>
<body>
  <h1>Page {pid or "root"}</h1>
  <p>Some very interesting body text for {pid or "root"}.</p>
{children}{extras}</body>
</html>
"""


def page_row(
    host: str,
    pid: str,
    *,
    status_code: int = 200,
    location: str | None = None,
    content_type: str = "text/html; charset=utf-8",
    branching: int = 10,
    extra_links=(),
    image_id: str | None = None,
    sep: str = "",
) -> dict:
    status_text = {
        200: "200 OK", 301: "301 Moved Permanently", 302: "302 Found",
        404: "404 Not Found", 500: "500 Internal Server Error",
    }.get(status_code, f"{status_code} Status")
    html = None
    if content_type.startswith("text/html") and status_code == 200:
        html = render_page(host, pid, branching, extra_links, sep=sep)
    return {
        "url": f"http://{host}/{pid}",
        "status_code": status_code,
        "status": status_text,
        "proto": "HTTP/1.1",
        "proto_major": 1,
        "proto_minor": 1,
        "content_type": content_type,
        "location": location,
        "headers": [
            {"K": "Content-Type", "V": content_type},
            {"K": "X-Page-Id", "V": pid or "/"},
        ],
        "html": html,
        "image_id": image_id,
    }


def _ids(branching: int, max_len: int):
    out = [""]
    frontier = [""]
    for _ in range(max_len):
        frontier = [p + str(e) for p in frontier for e in range(branching)]
        out.extend(frontier)
    return out


def nice_site(branching: int = 10, max_id_len: int = 4, host: str = SITE_HOST):
    """The 156-row-law site: pages for every digit-string id up to
    max_id_len (crawl at MaxDepth=3 touches ids of length <= 3)."""
    pages = pd.DataFrame([page_row(host, pid, branching=branching) for pid in _ids(branching, max_id_len)])
    robots = pd.DataFrame(
        [{"host": host, "scheme": "http", "status_code": 200, "body": "User-agent: *\nAllow: /\n"}]
    )
    seeds = [f"http://{host}/"]
    return pages, robots, seeds


def matrix_site():
    """Multi-host correctness matrix: robots variants, redirects,
    error statuses, non-HTML, image payloads, cross-host + messy links
    (queries, fragments, escapes) — SURVEY.md §5 / FIXTURES.md §1-4."""
    rows = []
    # host A: allow-all, the main site (branching 4, depth ids <=3)
    A, B, C, D, E, F_ = (f"site-{i}.test" for i in range(6))
    for pid in _ids(4, 3):
        extra = []
        if pid == "":
            extra = [
                (f"http://{B}/", "to B"),
                (f"http://{C}/", "to C"),
                (f"http://{D}/secret/1", "blocked on D"),
                (f"http://{D}/open/1", "open on D"),
                (f"http://{E}/", "to E (503 robots)"),
                (f"http://{F_}/", "to F (no robots)"),
                ("/redir/abs", "abs redirect"),
                ("/redir/rel", "rel redirect"),
                ("/gone", "404 page"),
                ("/boom", "500 page"),
                ("/doc.pdf", "a pdf"),
                ("/img/1", "an image"),
                ("/img/2", "another image"),
                ("/img/3", "a third image"),
                ("mailto:someone@example.com", "mail link"),
                ("/q?b=2&a=1", "query link"),
                ("/frag#section", "fragment link"),
                ("/esc%20aped/p", "escaped link"),
                ("/dup", "dup 1"),
                ("/dup#other", "dup 2 (same canon)"),
                ("http://missing.test/x", "dead host"),
            ]
        rows.append(page_row(A, pid, branching=4, extra_links=extra))
    # special pages on A
    rows.append(page_row(A, "redir/abs", status_code=301, location=f"http://{A}/target/abs", content_type="text/plain"))
    rows.append(page_row(A, "redir/rel", status_code=302, location="../target/rel", content_type="text/plain"))
    rows.append(page_row(A, "target/abs", branching=0))
    rows.append(page_row(A, "target/rel", branching=0))
    rows.append(page_row(A, "gone", status_code=404, content_type="text/plain"))
    rows.append(page_row(A, "boom", status_code=500, content_type="text/plain"))
    rows.append(page_row(A, "doc.pdf", content_type="application/pdf"))
    rows.append(page_row(A, "q?b=2&a=1", branching=0))
    rows.append(page_row(A, "frag", branching=0))
    rows.append(page_row(A, "esc%20aped/p", branching=0))
    rows.append(page_row(A, "dup", branching=0))
    # image pages on A (payload rows)
    for i in range(1, 4):
        rows.append(
            page_row(A, f"img/{i}", content_type="image/png", image_id=f"img-{i:04d}")
        )
    # host B: allow-all with own small tree
    for pid in _ids(2, 2):
        rows.append(page_row(B, pid, branching=2))
    # host C: disallow-all → blocked rows
    rows.append(page_row(C, "", branching=2))
    # host D: path-specific disallow /secret
    rows.append(page_row(D, "secret/1", branching=0))
    rows.append(page_row(D, "open/1", branching=0))
    # host E: robots 503 → disallow-all; host F: no robots row → disallow-all
    rows.append(page_row(E, "", branching=0))
    rows.append(page_row(F_, "", branching=0))

    pages = pd.DataFrame(rows)
    robots = pd.DataFrame(
        [
            {"host": A, "scheme": "http", "status_code": 200, "body": "User-agent: *\nDisallow:\n"},
            {"host": B, "scheme": "http", "status_code": 404, "body": None},
            {"host": C, "scheme": "http", "status_code": 200, "body": "User-agent: *\nDisallow: /\n"},
            {"host": D, "scheme": "http", "status_code": 200,
             "body": "User-agent: *\nDisallow: /secret\nAllow: /secret/allowed$\n"},
            {"host": E, "scheme": "http", "status_code": 503, "body": None},
            # F intentionally missing → fetch-error → disallow-all
        ]
    )
    seeds = [f"http://{A}/", f"http://{A}/", f"http://{A}#frag"]  # dup seed + fragment seed
    return pages, robots, seeds


def make_images(
    n: int = 8, w: int = 24, h: int = 16, jpeg_every: int = 0, webp_every: int = 0
) -> pd.DataFrame:
    """input_hint-shaped image corpus (image_id, bytes, w, h, fmt,
    caption, phash) — deterministic synth pixels, png/qjpg codecs.
    ``jpeg_every=k`` makes every k-th row a REAL baseline JFIF via the
    own pure-numpy codec (crawlspark/jpegcodec.py, r05) — q98, so even
    the PSNR>=40 payload invariant holds for them. ``webp_every=k``
    (applied after the jpeg rule) makes every k-th remaining row a
    REAL lossless VP8L webp (crawlspark/webpcodec.py, r06)."""
    rows = []
    for i in range(1, n + 1):
        image_id = f"img-{i:04d}"
        if jpeg_every and i % jpeg_every == 0:
            fmt = "jpeg"
        elif webp_every and i % webp_every == 0:
            fmt = "webp"
        else:
            fmt = "png" if i % 2 == 0 else "qjpg"
        arr = imagecodec.synth_image(image_id, w, h)
        rows.append(
            {
                "image_id": image_id,
                "bytes": imagecodec.encode(arr, fmt),
                "w": w,
                "h": h,
                "fmt": fmt,
                "caption": imagecodec.caption_for(image_id),
                "phash": imagecodec.phash64(arr),
            }
        )
    return pd.DataFrame(rows)


def make_videos(n: int = 8, n_frames: int = 12, w: int = 16, h: int = 16) -> pd.DataFrame:
    """Deterministic synthetic video corpus (video_id, bytes,
    n_frames, w, h, caption) — seed-keyed synth frames in BOTH
    container formats the sampler sniffs (r9): odd ids as QVID
    (crawlspark/videocodec.py, seekable lossy frames), even ids as
    animated WebP (crawlspark/webpanim.py, delta-rect lossless
    frames). BASELINE input rule: no external data; synthesize at
    small scale for tests/fixtures."""
    from . import videocodec, webpanim

    rows = []
    for i in range(1, n + 1):
        video_id = f"vid-{i:04d}"
        frames = videocodec.synth_video(video_id, n_frames, w, h)
        blob = (
            webpanim.encode_webp_anim(frames, durations=100)
            if i % 2 == 0
            else videocodec.encode_qvid(frames)
        )
        rows.append(
            {
                "video_id": video_id,
                "bytes": blob,
                "n_frames": n_frames,
                "w": w,
                "h": h,
                "caption": imagecodec.caption_for(video_id),
            }
        )
    return pd.DataFrame(rows)


def pages_to_spark(spark, pages_pdf: pd.DataFrame):
    from .schema import PAGE_SCHEMA

    recs = pages_pdf.astype(object).where(pd.notnull(pages_pdf), None).to_dict("records")
    return spark.createDataFrame(recs, schema=PAGE_SCHEMA)


def robots_to_spark(spark, robots_pdf: pd.DataFrame):
    from .schema import ROBOTS_FIXTURE_SCHEMA

    recs = robots_pdf.astype(object).where(pd.notnull(robots_pdf), None).to_dict("records")
    return spark.createDataFrame(recs, schema=ROBOTS_FIXTURE_SCHEMA)


def images_to_spark(spark, images_pdf: pd.DataFrame):
    from .schema import IMAGE_SCHEMA

    return spark.createDataFrame(images_pdf.to_dict("records"), schema=IMAGE_SCHEMA)
