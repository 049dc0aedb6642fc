"""Sitemap source — parity with /root/reference/sitemap/sitemap.go:20-97
and the recursive index expansion in crawl.go:175-216.

Parses <urlset><url><loc> and <sitemapindex><sitemap><loc>; index
expansion recurses sequentially on the driver (the reference is
deliberately non-concurrent here, crawl.go:173-174) with a visited-set
+ depth bound added for safety. Fetching goes through a fetcher
callable (url -> bytes | None) so the same code serves the fixture
tables (sandbox) and HTTP (production).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Callable

__all__ = ["parse", "parse_index", "fetch_all", "list_from_text"]

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def _locs(root, container: str) -> list[str]:
    out = []
    for el in root:
        if el.tag in (f"{_NS}{container}", container):
            for loc in el:
                if loc.tag in (f"{_NS}loc", "loc") and loc.text:
                    out.append(loc.text.strip())
    return out


def parse(data: bytes | str) -> list[str]:
    """URLs from a <urlset> document (sitemap.go:32-46). Raises on
    malformed XML (TestInvalidData parity)."""
    root = ET.fromstring(data)
    if root.tag not in (f"{_NS}urlset", "urlset"):
        return []
    return _locs(root, "url")


def parse_index(data: bytes | str) -> list[str]:
    """Child sitemap URLs from a <sitemapindex> (sitemap.go:50-64)."""
    root = ET.fromstring(data)
    if root.tag not in (f"{_NS}sitemapindex", "sitemapindex"):
        return []
    return _locs(root, "sitemap")


def fetch_all(
    url: str,
    fetcher: Callable[[str], bytes | None],
    max_depth: int = 5,
    _seen: set | None = None,
) -> list[str]:
    """Recursively expand a sitemap or sitemap index into page URLs
    (crawl.go:175-216): try urlset first; if empty, treat as index and
    recurse per child, sequentially."""
    seen = _seen if _seen is not None else set()
    if url in seen or max_depth < 0:
        return []
    seen.add(url)
    data = fetcher(url)
    if data is None:
        return []
    urls = parse(data)
    if urls:
        return urls
    out: list[str] = []
    for child in parse_index(data):
        out.extend(fetch_all(child, fetcher, max_depth - 1, seen))
    return out


def list_from_text(text: str) -> list[str]:
    """`crawl list -format=text` input: one URL per line, blank lines
    skipped (crawl.go:162-169)."""
    return [line.strip() for line in text.splitlines() if line.strip()]
