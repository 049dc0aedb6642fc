"""URL canonicalization & RFC 3986 resolution.

Pure-Python core shared by the Spark engine (wrapped in vectorized
pandas UDFs, see :func:`canon_address_udf`) and by the sequential
oracle (tests/oracle parity). Two modes:

``go-parity``
    Replicates the reference's Go ``net/url`` behaviour
    (/root/reference/crawler/data/address.go:17-53 and the seed path
    /root/reference/crawler/crawler.go:26-41): lowercased scheme, host
    preserved as-is, original (valid) percent-escaping of the path
    preserved verbatim, query preserved byte-for-byte, fragment
    stripped (addresses) or kept (seeds), empty path defaulted to "/".
    Invalid percent escapes or control characters -> parse error ->
    ``None`` (Go ``url.Parse`` errors; MakeAddress returns nil).

``extended``
    go-parity + lowercase host, percent-decode of unreserved
    characters, uppercase remaining escapes, sorted query parameters,
    default-port stripping — the production mode demanded by the
    north rule (RFC 3986 normalize + percent-decode + sort-query).

The hot path is vectorized: a regex fast-path handles plain absolute
http(s) URLs without escapes in one pandas ``str.extract`` pass; only
the residue falls back to per-element parsing (still inside an Arrow
batch — no row-at-a-time Python UDFs anywhere).
"""

from __future__ import annotations

import re
from urllib.parse import urljoin

__all__ = [
    "parse_url",
    "serialize",
    "canon_seed",
    "make_address",
    "resolve_address",
    "extended_canon",
    "ADDRESS_FIELDS",
]

ADDRESS_FIELDS = ("Full", "Scheme", "Opaque", "Host", "Path", "Query")

_HEX = "0123456789abcdefABCDEF"

# Characters Go's net/url leaves unescaped when re-encoding a path
# (encodePath mode): RFC 3986 unreserved + sub-delims + ":@".
_PATH_SAFE = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~$&+,/;:=?@!'()*"
)

_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+\-.]*):(.*)$", re.S)

# Fast path: absolute http(s) URL, no percent-escapes, no control
# chars, nonempty host. Groups: scheme, host, path, query, fragment.
FAST_URL_RE = re.compile(
    r"^(https?)://([A-Za-z0-9.\-_:]+)((?:/[^?#%\s\x00-\x1f]*)?)"
    r"(?:\?([^#%\s\x00-\x1f]*))?(?:#([^\s\x00-\x1f]*))?$"
)


class URLParts:
    """Decomposed URL mirroring the fields Go's url.URL exposes that
    the reference touches: Scheme, Opaque, Host, Path (decoded),
    RawPath (original escaping when it differs), RawQuery, Fragment."""

    __slots__ = ("scheme", "opaque", "host", "raw_path", "raw_query", "fragment")

    def __init__(self, scheme="", opaque="", host="", raw_path="", raw_query=None, fragment=None):
        self.scheme = scheme
        self.opaque = opaque
        self.host = host
        self.raw_path = raw_path  # escaped form, original escaping preserved
        self.raw_query = raw_query  # None = no "?" present
        self.fragment = fragment  # None = no "#" present


_CTRL_RE = re.compile(r"[\x00-\x1f\x7f]")


def _valid_escapes(s: str) -> bool:
    i = s.find("%")
    n = len(s)
    while i != -1:
        if i + 2 >= n or s[i + 1] not in _HEX or s[i + 2] not in _HEX:
            return False
        i = s.find("%", i + 3)
    return True


# parse_url fast shape (r10): plain absolute http(s) URL — lowercase
# scheme, ASCII-word host, and NO percent escapes anywhere (so every
# _valid_escapes check is trivially true), no control chars incl.
# \x7f (which _CTRL_RE rejects but FAST_URL_RE's classes let through
# — this pattern excludes it everywhere), no whitespace/quotes in the
# host. Any other shape falls through to the general parser, so the
# fast path can only be a pure shortcut; equivalence is
# property-tested field-by-field in tests/test_canon.py.
_PARSE_FAST_RE = re.compile(
    r"^(https?)://([A-Za-z0-9.\-_:]+)((?:/[^?#%\s\x00-\x1f\x7f]*)?)"
    r"(?:\?([^#%\s\x00-\x1f\x7f]*))?(?:#([^%\s\x00-\x1f\x7f]*))?$"
)


def parse_url(raw: str) -> URLParts | None:
    """Parse like Go ``url.Parse``: split scheme/authority/path/query/
    fragment, validate percent escapes in the path, reject control
    characters. Returns None on error (Go returns err)."""
    if raw is None:
        return None
    m = _PARSE_FAST_RE.match(raw)
    if m is not None:
        u = URLParts()
        u.scheme = m.group(1)
        u.host = m.group(2)
        u.raw_path = m.group(3)
        u.raw_query = m.group(4)
        u.fragment = m.group(5)
        return u
    return _parse_url_general(raw)


def _parse_url_general(raw: str) -> URLParts | None:
    """The general parser — the authority the fast path must match."""
    if _CTRL_RE.search(raw):
        return None
    u = URLParts()
    rest = raw
    # fragment
    if "#" in rest:
        rest, frag = rest.split("#", 1)
        if not _valid_escapes(frag):
            return None
        u.fragment = frag
    m = _SCHEME_RE.match(rest)
    if m and not m.group(1)[0].isdigit():
        u.scheme = m.group(1).lower()
        rest = m.group(2)
    # query
    if "?" in rest:
        rest, q = rest.split("?", 1)
        u.raw_query = q  # Go defers query escape validation to Query()
    if u.scheme and not rest.startswith("/"):
        # opaque URI like mailto:user@host
        if not _valid_escapes(rest):
            return None
        u.opaque = rest
        return u
    if rest.startswith("//"):
        rest = rest[2:]
        slash = len(rest)
        for i, ch in enumerate(rest):
            if ch in "/?#":
                slash = i
                break
        u.host, rest = rest[:slash], rest[slash:]
        if any(ch in u.host for ch in " <>\"") or not _valid_escapes(u.host):
            return None
    if not _valid_escapes(rest):
        return None
    u.raw_path = rest
    return u


def serialize(u: URLParts, *, with_fragment: bool = True) -> str:
    """Re-serialize like Go ``url.URL.String()`` for the subset of
    shapes the crawler produces (scheme://host/path?query#frag or
    opaque)."""
    out = []
    if u.scheme:
        out.append(u.scheme + ":")
    if u.opaque:
        out.append(u.opaque)
    else:
        if u.host or u.scheme in ("http", "https", "ftp", "file", "ws", "wss"):
            out.append("//" + u.host)
        path = u.raw_path
        if path and u.host and not path.startswith("/"):
            path = "/" + path
        out.append(path)
    if u.raw_query is not None:
        out.append("?" + u.raw_query)
    if with_fragment and u.fragment is not None and u.fragment != "":
        out.append("#" + u.fragment)
    return "".join(out)


def _unescape(s: str) -> str:
    """Percent-decode (assumes validated escapes)."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == "%" and i + 2 < n:
            out.append(chr(int(s[i + 1 : i + 3], 16)))
            i += 3
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def _escape_path(path: str) -> str:
    """Go encodePath escaping for a decoded path."""
    out = []
    for ch in path:
        if ch in _PATH_SAFE:
            out.append(ch)
        else:
            out.append("".join("%%%02X" % b for b in ch.encode("utf-8")))
    return "".join(out)


def canon_seed(raw: str) -> str | None:
    """Seed-queue canonicalization (crawler.go:26-41): parse, default
    empty path to "/" per RFC 1945, re-serialize. NOTE: fragments are
    *kept* here (the reference only strips them in addressFromURL) —
    the seen-set key for seeds therefore retains the fragment,
    matching crawler.go:143-145."""
    u = parse_url(raw)
    if u is None:
        return None
    if u.raw_path == "" and not u.opaque:
        u.raw_path = "/"
    return serialize(u, with_fragment=True)


def make_address(raw: str) -> dict | None:
    """MakeAddress parity (address.go:17-38): parse, default empty
    path, strip fragment, expose the six Address fields. ``Path`` is
    the *escaped* path (EscapedPath, address.go:35)."""
    u = parse_url(raw)
    if u is None:
        return None
    return _address_from_parts(u)


def _address_from_parts(u: URLParts) -> dict:
    if u.raw_path == "":
        u.raw_path = "/"
    full = serialize(u, with_fragment=False)
    return {
        "Full": full,
        "Scheme": u.scheme,
        "Opaque": u.opaque,
        "Host": u.host,
        "Path": u.raw_path if not u.opaque else _escape_path("/"),
        "Query": u.raw_query or "",
    }


# hrefs a resolver can turn into an Address by pure string concat:
# path-absolute, only unreserved/path chars — no escapes ('%'), no
# query/fragment ('?'/'#'), no spaces/quotes/control chars, so
# parse_url would return (raw_path=href, raw_query=None,
# fragment=None) and serialize() is exactly origin + href. The
# dominant shape in link corpora; equivalence with the general path
# is property-tested (tests/test_canon.py).
_PLAIN_ABS_RE = re.compile(r"^/[A-Za-z0-9._~!$&'()*+,;=:@/\-]*$")


def make_resolver_parts(base_full: str):
    """Tuple-returning core of :func:`make_resolver` (r10): resolves
    ``href`` to ``(Full, Scheme, Opaque, Host, Path, Query)`` or None,
    parsing the base ONCE. The columnar parse path consumes the tuple
    directly (no per-link dict build); ``make_resolver`` wraps it, so
    the two can never diverge."""
    bu = parse_url(base_full) if base_full is not None else None
    fast_ok = bu is not None and bu.scheme and bu.host
    origin = (bu.scheme + "://" + bu.host) if fast_ok else None
    bscheme = bu.scheme if bu is not None else None
    bhost = bu.host if bu is not None else None
    plain = _PLAIN_ABS_RE.match

    def resolve(href: str) -> tuple | None:
        if bu is None or href is None:
            return None
        if href.startswith("/") and not href.startswith("//") and "/." not in href:
            if fast_ok and plain(href):
                return (origin + href, bscheme, "", bhost, href, "")
            hu = parse_url(href)
            if hu is None:
                return None
            if not bu.scheme or not bu.host:
                return None
            hu.scheme, hu.opaque, hu.host = bu.scheme, "", bu.host
            a = _address_from_parts(hu)
            return (a["Full"], a["Scheme"], a["Opaque"], a["Host"], a["Path"], a["Query"])
        a = resolve_address(base_full, href)
        if a is None:
            return None
        return (a["Full"], a["Scheme"], a["Opaque"], a["Host"], a["Path"], a["Query"])

    return resolve


def make_resolver(base_full: str):
    """Per-page resolver that parses the base ONCE and reuses it for
    every link/canonical/hreflang on the page (50+ resolutions per
    page in link-dense corpora — the hydration hot path). Plain
    path-absolute hrefs skip URL parsing entirely (string-concat
    Address; r05, VERDICT r04 #3). Thin dict view over
    :func:`make_resolver_parts`."""
    rp = make_resolver_parts(base_full)

    def resolve(href: str) -> dict | None:
        t = rp(href)
        if t is None:
            return None
        return {
            "Full": t[0],
            "Scheme": t[1],
            "Opaque": t[2],
            "Host": t[3],
            "Path": t[4],
            "Query": t[5],
        }

    return resolve


def resolve_address(base_full: str, href: str) -> dict | None:
    """MakeAddressResolved parity (address.go:40-53): RFC 3986
    resolution of ``href`` against ``base_full``, then Address
    construction. Returns None when either URL fails to parse.

    Fast path: path-absolute hrefs ("/p...", the dominant shape in
    link corpora) resolve as origin+href without urljoin — ~2x parse
    throughput; equivalence with the slow path is property-tested
    (tests/test_canon.py)."""
    if base_full is None or href is None:
        return None
    if (
        href.startswith("/")
        and not href.startswith("//")
        and "/." not in href  # dot-segments need RFC removal -> slow path
    ):
        hu = parse_url(href)
        if hu is None:
            return None
        bu = parse_url(base_full)
        if bu is None or not bu.scheme or not bu.host:
            return None
        hu.scheme, hu.opaque, hu.host = bu.scheme, "", bu.host
        return _address_from_parts(hu)
    if href.startswith("http://") or href.startswith("https://"):
        # absolute http(s) href: RFC 3986 resolution of an absolute
        # reference is the reference itself once its path's dot
        # segments are removed — with none present ("/." guard covers
        # "/./", "/../" and trailing "/."/"/.."), urljoin(base, href)
        # == href byte-for-byte, so skip the base parse + urljoin +
        # re-parse (one slow resolve per page: the canonical link).
        # Base must still PARSE (parity: the general path returns None
        # for an unparseable base even when href is absolute).
        # Equivalence property-tested in tests/test_canon.py.
        hu = parse_url(href)
        if hu is None:
            return None
        # raw_query == "" (trailing "?") is excluded: python's urljoin
        # drops the bare "?" and this branch must stay byte-faithful
        # to the urljoin path (unlike the path-absolute fast path,
        # which deliberately matches Go instead — see
        # test_resolve_trailing_question_mark_go_parity).
        if hu.host and not hu.opaque and "/." not in hu.raw_path and hu.raw_query != "":
            if parse_url(base_full) is None:
                return None
            return _address_from_parts(hu)
    if parse_url(href) is None:
        return None
    if parse_url(base_full) is None:
        return None
    joined = urljoin(base_full, href)
    u = parse_url(joined)
    if u is None:
        return None
    return _address_from_parts(u)


_UNRESERVED = set(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_DEFAULT_PORT = {"http": ":80", "https": ":443"}


def _norm_escapes(s: str) -> str:
    """Decode unreserved percent-escapes; uppercase the rest."""
    if "%" not in s:
        return s
    out = []
    i, n = 0, len(s)
    while i < n:
        if s[i] == "%" and i + 2 <= n - 1:
            h = s[i + 1 : i + 3]
            ch = chr(int(h, 16))
            if ch in _UNRESERVED:
                out.append(ch)
            else:
                out.append("%" + h.upper())
            i += 3
        else:
            out.append(s[i])
            i += 1
    return "".join(out)


def extended_canon(raw: str) -> str | None:
    """north_rule production canonicalization: go-parity + lowercase
    host, strip default port, percent-decode unreserved, uppercase
    remaining escapes, sort query parameters, strip fragment."""
    u = parse_url(raw)
    if u is None:
        return None
    u.host = u.host.lower()
    dp = _DEFAULT_PORT.get(u.scheme)
    if dp and u.host.endswith(dp):
        u.host = u.host[: -len(dp)]
    if u.raw_path == "" and not u.opaque:
        u.raw_path = "/"
    u.raw_path = _norm_escapes(u.raw_path)
    if u.raw_query:
        parts = u.raw_query.split("&")
        u.raw_query = "&".join(sorted(_norm_escapes(p) for p in parts))
    u.fragment = None
    return serialize(u, with_fragment=False)
