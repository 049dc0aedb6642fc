"""Canonicalization goldens — FIXTURES.md §7, SURVEY.md §7.4/§7.5.

Go-parity cases cite /root/reference/crawler/data/address.go and
crawler.go; each golden documents the behaviour it pins.
"""

import pytest

from crawlspark import canon

GO_PARITY = [
    # (raw, expected Full via make_address)
    ("http://example.com", "http://example.com/"),  # empty path -> "/" (address.go:26-27)
    ("http://example.com/a#frag", "http://example.com/a"),  # fragment strip (address.go:29)
    ("http://example.com/a%20b", "http://example.com/a%20b"),  # valid escapes preserved (EscapedPath, address.go:35)
    ("http://example.com/a?b=2&a=1", "http://example.com/a?b=2&a=1"),  # query byte-preserved
    ("HTTP://example.com/X", "http://example.com/X"),  # scheme lowercased, rest as-is
    ("http://EXAMPLE.com/", "http://EXAMPLE.com/"),  # go-parity: host NOT lowercased
    ("http://example.com/?", "http://example.com/?"),  # empty query kept ('?' present)
    ("http://example.com/a#", "http://example.com/a"),  # empty fragment dropped
]


@pytest.mark.parametrize("raw,full", GO_PARITY)
def test_make_address_go_parity(raw, full):
    a = canon.make_address(raw)
    assert a is not None
    assert a["Full"] == full


def test_make_address_fields():
    a = canon.make_address("https://h.test:8080/p%20x/y?q=1&r=2#z")
    assert a == {
        "Full": "https://h.test:8080/p%20x/y?q=1&r=2",
        "Scheme": "https",
        "Opaque": "",
        "Host": "h.test:8080",
        "Path": "/p%20x/y",
        "Query": "q=1&r=2",
    }


def test_invalid_percent_escape_is_parse_error():
    # Go url.Parse errors on invalid escapes -> MakeAddress nil
    assert canon.make_address("http://example.com/bad%zz") is None
    assert canon.make_address("http://example.com/bad%2") is None


def test_control_chars_rejected():
    assert canon.make_address("http://example.com/a\x00b") is None


def test_seed_keeps_fragment_and_defaults_path():
    # crawler.go:26-41: initialQueue defaults path but keeps fragment;
    # the seen-set key for seeds therefore retains the fragment.
    assert canon.canon_seed("http://example.com#f") == "http://example.com/#f"
    assert canon.canon_seed("http://example.com/a#f") == "http://example.com/a#f"
    assert canon.canon_seed("http://example.com") == "http://example.com/"


RESOLVE = [
    # (base, href, expected Full) — RFC 3986 via ResolveReference (address.go:40-53)
    ("http://h.test/a/b", "c", "http://h.test/a/c"),
    ("http://h.test/a/b/", "../x", "http://h.test/a/x"),
    ("http://h.test/a/b", "/root", "http://h.test/root"),
    ("http://h.test/a/b", "//other.test/z", "http://other.test/z"),
    ("http://h.test/a/b?q=1", "", "http://h.test/a/b?q=1"),  # empty ref -> base minus fragment
    ("http://h.test/a/b", "#sec", "http://h.test/a/b"),  # fragment-only -> base (frag stripped)
    ("http://h.test/a/b", "https://s.test/x", "https://s.test/x"),
    ("http://h.test/", "?a=2", "http://h.test/?a=2"),
]


@pytest.mark.parametrize("base,href,full", RESOLVE)
def test_resolve(base, href, full):
    a = canon.resolve_address(base, href)
    assert a is not None and a["Full"] == full


def test_resolve_bad_href_none():
    assert canon.resolve_address("http://h.test/", "http://bad%zz/") is None


EXTENDED = [
    ("HTTP://EXAMPLE.com:80/a%2Fb%41?b=2&a=1#f", "http://example.com/a%2FbA?a=1&b=2"),
    ("https://H.test:443/x", "https://h.test/x"),
    ("http://h.test/%7Euser", "http://h.test/~user"),
    ("http://h.test/a%3fb", "http://h.test/a%3Fb"),  # reserved escape uppercased
]


@pytest.mark.parametrize("raw,expect", EXTENDED)
def test_extended_canon(raw, expect):
    assert canon.extended_canon(raw) == expect


def test_opaque_url():
    a = canon.make_address("mailto:user@example.com")
    assert a["Full"] == "mailto:user@example.com"
    assert a["Opaque"] == "user@example.com"
    assert a["Path"] == "/"


def test_fast_path_matches_urljoin():
    """Property check: the path-absolute fast path in resolve_address
    equals the urljoin slow path on a representative corpus."""
    from urllib.parse import urljoin as uj

    bases = [
        "http://h.test/a/b?q=1",
        "https://h.test:8080/",
        "http://UPPER.test/x#frag",
    ]
    hrefs = [
        "/", "/x", "/x/y?a=1&b=2", "/x#sec", "/%20esc/p", "/q?b=2&a=1",
    ]
    for b in bases:
        for h in hrefs:
            fast = canon.resolve_address(b, h)
            joined = uj(b, h)
            u = canon.parse_url(joined)
            slow = canon._address_from_parts(u)
            assert fast == slow, (b, h, fast, slow)


def test_resolver_plain_abs_fast_path_equivalence():
    """r05: make_resolver's string-concat fast path for plain
    path-absolute hrefs must equal the general parse+serialize path
    byte-for-byte — on hrefs inside AND outside the plain charset
    (outside ones must fall through, not mis-resolve)."""
    bases = [
        "http://h.test/a/b?q=1",
        "https://h.test:8080/",
        "http://bench-0001.test/3.1",
    ]
    hrefs = [
        "/", "/x", "/3.0", "/a/b/c", "/x_y-z~", "/p!$&'()*+,;=:@q",
        # outside the plain charset -> general path
        "/x?a=1", "/x#sec", "/%20esc", "/q?", "/with space", "/<lt>",
        # dot segments -> slow path
        "/./x", "/a/../b",
        # not path-absolute at all
        "rel/x", "//other.test/p", "http://abs.test/p", "",
    ]
    for b in bases:
        resolve = canon.make_resolver(b)
        for h in hrefs:
            got = resolve(h)
            want = canon.resolve_address(b, h)
            assert got == want, (b, h, got, want)


def test_resolve_trailing_question_mark_go_parity():
    # Go url.Parse("/x?") sets ForceQuery -> String() keeps the "?";
    # python's urljoin drops it. The fast path matches Go.
    a = canon.resolve_address("http://h.test/a", "/x?")
    assert a["Full"] == "http://h.test/x?"


def _parts_tuple(u):
    if u is None:
        return None
    return (u.scheme, u.opaque, u.host, u.raw_path, u.raw_query, u.fragment)


def test_parse_url_fast_path_equivalence():
    """r10: parse_url's plain-absolute fast shape must equal the
    general parser FIELD-BY-FIELD — on shapes inside the fast charset
    and on every boundary that must fall through (escapes, ctrl chars
    incl \\x7f, userinfo, uppercase scheme, unicode hosts, empty
    host, opaque, relative)."""
    import random

    corpus = [
        "http://h.test/a/b", "https://h.test:8080/", "http://h.test",
        "http://h.test/", "http://h.test/p?q=1", "http://h.test/p#f",
        "http://h.test/p?a=1&b=2#sec", "http://h.test/p?a#b#c",
        "http://h.test/p?a?b", "http://h.test/p#f?q", "http://h.test/#",
        "http://h.test/?", "http://h.test/p%20x", "http://h.test/p%zz",
        "http://h.test/\x7fp", "http://h.test/\x01p", "http://h.test/p q",
        "http://user@h.test/p", "HTTP://h.test/p", "hTtPs://h.test/p",
        "http:///p", "http://", "ftp://h.test/p", "mailto:user@h.test",
        "//proto-rel.test/p", "/just/a/path", "rel/path", "",
        "http://bü.test/p", "http://h.test/pü", "http://h.test:80/p",
        "http://h.test/a!$&'()*+,;=:@b", "http://h.test/a<b>\"c",
        "http://h.test/p#", "http://h.test/p#%20", "http://h.test/p?%zz",
    ]
    rng = random.Random(20260822)
    alphabet = "ab.:/?#%20\x7f \tZü-_~!@&="
    for _ in range(4000):
        n = rng.randrange(0, 24)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        corpus.append(rng.choice(["http://", "https://", "HTTP://", ""]) + s)
    for raw in corpus:
        fast = canon.parse_url(raw)
        slow = canon._parse_url_general(raw)
        assert _parts_tuple(fast) == _parts_tuple(slow), (
            raw, _parts_tuple(fast), _parts_tuple(slow))


def test_resolve_absolute_href_fast_path_equivalence():
    """r10: resolve_address's absolute-http(s)-href shortcut must
    equal the urljoin general path byte-for-byte, and boundary shapes
    (dot segments, empty host, escapes, uppercase scheme) must fall
    through to it unchanged."""
    from urllib.parse import urljoin as uj

    bases = [
        "http://h.test/a/b?q=1",
        "https://h.test:8080/",
        "http://bench-0001.test/3.1",
        "not a url",
    ]
    hrefs = [
        "http://www.example.com/c", "http://other.test", "https://o.test/",
        "http://o.test/p?a=1&b=2", "http://o.test/p#sec", "http://o.test/p?",
        "http://o.test/p%20x", "http://o.test/./p", "http://o.test/a/../b",
        "http://o.test/p/.", "http://o.test/p/..", "HTTP://o.test/p",
        "http:///nohost", "http://o.test/p q", "http://user@o.test/p",
        "http://o.test/p?q#f", "http://o.test/a!$&'()*+,;=:@b",
        "http://o.test?q=1", "http://o.test#f", "http://o.test/p#",
    ]
    for b in bases:
        for h in hrefs:
            got = canon.resolve_address(b, h)
            # reference: the general branch, replicated verbatim
            if canon.parse_url(h) is None or canon.parse_url(b) is None:
                want = None
            else:
                u = canon.parse_url(uj(b, h))
                want = None if u is None else canon._address_from_parts(u)
            assert got == want, (b, h, got, want)
