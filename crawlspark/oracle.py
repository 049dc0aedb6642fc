"""Sequential single-threaded oracle of the reference crawler's
semantics, used as the golden against which the distributed Spark
engine is exact-matched (SURVEY.md §5.1).

It reimplements the reference state machine's *observable* behaviour
in plain Python over the fixture tables (no Spark, no concurrency):

- FIFO queue per depth wave, level-synchronized
  (/root/reference/crawler/state.go:20-115);
- seeds: path-defaulted, fragment KEPT in the queue/seen key
  (crawler.go:26-41, 143-145), duplicates fetched twice;
- robots gate per robots URL with 2xx/4xx/5xx/error mapping, blocked
  rows still emitted (state.go:46-64, crawler.go:278-295);
- fetch errors (URL absent from the pages fixture) drop silently
  (crawler.go:256-259);
- hydration: headers, HTML extraction, redirect resolution
  (crawler/data/result.go:45-115);
- merge order: redirect target BEFORE page links, document order;
  willCrawl scope -> seen check -> nofollow check (crawler.go:220-274);
- depth guard: no merge at depth == MaxDepth (crawler.go:223).

Determinism contract (SURVEY.md §7.6): every emitted row carries
(depth, priority, url_key); the engine must produce the same multiset
of rows and the same seen-set, and its output sorted by
(depth, priority, url_key) is the canonical order.
"""

from __future__ import annotations

from . import canon, htmlex, robots
from .config import CrawlConfig
from .scope import will_crawl

__all__ = ["crawl_oracle", "make_result_dict", "fetch_key", "blocked_result"]

PRIORITY_SEED = 0
PRIORITY_REDIRECT = 1
PRIORITY_LINK = 2


def fetch_key(queue_url: str) -> str:
    """What the server sees: the queue URL minus its fragment (Go's
    http client never sends the fragment)."""
    u = canon.parse_url(queue_url)
    if u is None:
        return queue_url
    return canon.serialize(u, with_fragment=False)


def _sorted_header_pairs(headers) -> list:
    """Tuple core of :func:`_sorted_headers` (r10): K-sorted
    ``(K, V)`` pairs — the columnar parse path appends these flat."""
    # accepts list/tuple/ndarray (Arrow passthrough) or None — no `or`
    # (ndarray truthiness raises)
    if headers is None or len(headers) == 0:
        return []
    hs = [(h["K"], h["V"]) for h in headers]
    hs.sort(key=lambda p: p[0])  # K only — stable on ties, like the dict path always was
    return hs


def _sorted_headers(headers) -> list:
    return [{"K": k, "V": v} for k, v in _sorted_header_pairs(headers)]


def blocked_result(url_key: str, depth: int) -> dict:
    """MakeResult(addr, depth, nil) + Status override (state.go:58-61).
    Title/Description/H1/Robots are ""-not-null (no omitempty on those
    Go fields, result.go:27-30); everything response-ish is null."""
    return {
        "Address": canon.make_address(url_key),
        "Depth": depth,
        "BodyTextHash": None,
        "Description": "",
        "Title": "",
        "H1": "",
        "Robots": "",
        "Canonical": None,
        "Links": None,
        "Hreflang": None,
        "Status": "Blocked by robots.txt",
        "StatusCode": None,
        "Proto": None,
        "ProtoMajor": None,
        "ProtoMinor": None,
        "Header": None,
        "ResolvesTo": None,
    }


def make_result_dict(url_key: str, depth: int, page: dict) -> dict:
    """Hydrated Result (result.go:45-115) from a pages-fixture row."""
    addr = canon.make_address(url_key)
    base_full = addr["Full"] if addr else None
    res = {
        "Address": addr,
        "Depth": depth,
        "BodyTextHash": None,
        "Description": "",
        "Title": "",
        "H1": "",
        "Robots": "",
        "Canonical": None,
        "Links": None,
        "Hreflang": None,
        "Status": page["status"],
        "StatusCode": page["status_code"] or None,
        "Proto": page["proto"],
        "ProtoMajor": page["proto_major"],
        "ProtoMinor": page["proto_minor"],
        "Header": _sorted_headers(page.get("headers")),
        "ResolvesTo": addr,
    }
    ct = page.get("content_type") or ""
    if ct.startswith("text/html") and page.get("html"):
        resolve = canon.make_resolver(base_full)  # parse base once
        ex = htmlex.extract_html(page["html"])
        res["Title"] = ex["Title"]
        res["H1"] = ex["H1"]
        res["Description"] = ex["Description"]
        res["Robots"] = ex["Robots"]
        res["BodyTextHash"] = ex["BodyTextHash"]
        res["Canonical"] = {
            "Address": resolve(ex["CanonicalHref"]),
            "Href": ex["CanonicalHref"],
        }
        res["Hreflang"] = [
            {"Address": resolve(href), "Href": href, "Hreflang": lang}
            for href, lang in ex["Hreflang"]
        ] or None
        res["Links"] = [
            {
                "Address": resolve(href),
                "Anchor": anchor,
                "Href": href,
                "Nofollow": nofollow,
            }
            for href, anchor, nofollow in ex["Links"]
        ] or None
    sc = page["status_code"]
    if sc and 300 <= sc < 400:
        res["ResolvesTo"] = canon.resolve_address(base_full, page.get("location") or "")
    return res


def crawl_oracle(cfg: CrawlConfig, pages: dict, robots_rows: dict):
    """Run the sequential crawl.

    pages: {fetchable url -> page row dict}
    robots_rows: {(scheme, host) -> (status_code, body)}

    Returns (results, seen, frontier_log) where results is a list of
    (depth, priority, url_key, result_dict) in reference emission
    order, seen the final seen-set, frontier_log[d] the list of
    (url_key, priority) enqueued for depth d.
    """
    cfg.validate()
    extended = getattr(cfg, "canon_mode", "go-parity") == "extended"

    def key_of(full: str) -> str:
        return (canon.extended_canon(full) or full) if extended else full

    queue = []
    for s in cfg.From:
        cs = canon.canon_seed(s)
        if cs is None:
            raise ValueError(f"bad seed URL {s!r}")
        queue.append((key_of(cs), cs, PRIORITY_SEED))
    seen = {k for k, _, _ in queue}
    robots_cache: dict[str, robots.Matcher] = {}
    results = []
    frontier_log = {0: list(queue)}
    depth = 0
    while queue:
        # Two-phase wave: collect every filter-passing discovery, then
        # reduce per canonical key by min(priority, fetch_url). The
        # reference's first-discovery-wins under mutex arrival order is
        # nondeterministic (crawler.go:240-247); the enqueued SET is
        # order-independent (non-passing discoveries never mutate
        # state), and min() is our deterministic refinement (§7.6).
        passing: dict[str, tuple[int, str]] = {}
        order: list[str] = []
        for url_key, fetch_url, priority in queue:
            rurl = robots.locate(fetch_url)
            if rurl is None:
                continue  # crawlCheckRobots parse error -> skip silently
            if rurl not in robots_cache:
                u = canon.parse_url(rurl)
                row = robots_rows.get((u.scheme, u.host))
                ruleset = robots.from_status(*(row if row else (None, None)))
                robots_cache[rurl] = robots.Matcher(ruleset, cfg.RobotsUserAgent)
            if not robots_cache[rurl].allowed(fetch_url):
                results.append((depth, priority, url_key, blocked_result(fetch_url, depth)))
                continue
            page = pages.get(fetch_key(fetch_url))
            if page is None:
                continue  # fetch error -> silent drop (crawler.go:256-259)
            res = make_result_dict(fetch_url, depth, page)
            if depth < cfg.MaxDepth:
                candidates = []
                sc = page["status_code"]
                if sc and 300 <= sc < 400 and res["ResolvesTo"]:
                    candidates.append((res["ResolvesTo"]["Full"], False, PRIORITY_REDIRECT))
                for link in res["Links"] or []:
                    if link["Address"] is None:
                        continue
                    candidates.append((link["Address"]["Full"], link["Nofollow"], PRIORITY_LINK))
                for full, nofollow, prio in candidates:
                    if not will_crawl(full, cfg.Include, cfg.Exclude):
                        continue
                    k = key_of(full)
                    if k in seen:
                        continue
                    # NB: nofollow checked AFTER seen, and a skipped
                    # nofollow link does NOT enter seen (crawler.go:240-247)
                    if nofollow and cfg.RespectNofollow:
                        continue
                    if k not in passing:
                        order.append(k)
                        passing[k] = (prio, full)
                    else:
                        passing[k] = min(passing[k], (prio, full))
            results.append((depth, priority, url_key, res))
        nextq = [(k, passing[k][1], passing[k][0]) for k in order]
        seen.update(order)
        queue = nextq
        depth += 1
        if queue:
            frontier_log[depth] = list(queue)
    return results, seen, frontier_log
