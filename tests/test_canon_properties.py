"""Property-based canon invariants (hypothesis): idempotence of both
canonicalization modes and fast-path/slow-path resolution agreement
over generated URL shapes — SURVEY.md §7.4 risk #3 hardening."""

from urllib.parse import urljoin

import hypothesis.strategies as st
from hypothesis import given, settings

from crawlspark import canon

_scheme = st.sampled_from(["http", "https"])
_host = st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9\-]{0,10}\.)+[a-z]{2,5}(:[0-9]{1,4})?", fullmatch=True)
# valid percent-escapes only — a bare '%' is a parse error by design
_pathseg = st.from_regex(r"([a-zA-Z0-9._~\-]|%41|%2F|%7e){0,8}", fullmatch=True)
_path = st.lists(_pathseg, max_size=4).map(lambda segs: "/" + "/".join(segs))
_query = st.one_of(
    st.none(),
    st.lists(
        st.tuples(
            st.from_regex(r"[a-z]{1,4}", fullmatch=True),
            st.from_regex(r"[a-zA-Z0-9]{0,6}", fullmatch=True),
        ),
        max_size=3,
    ).map(lambda kvs: "&".join(f"{k}={v}" for k, v in kvs)),
)
_fragment = st.one_of(st.none(), st.from_regex(r"[a-zA-Z0-9]{0,6}", fullmatch=True))


@st.composite
def urls(draw):
    u = f"{draw(_scheme)}://{draw(_host)}{draw(_path)}"
    q = draw(_query)
    if q is not None:
        u += "?" + q
    f = draw(_fragment)
    if f is not None:
        u += "#" + f
    return u


@given(urls())
@settings(max_examples=200, deadline=None)
def test_make_address_idempotent(u):
    a = canon.make_address(u)
    assert a is not None
    again = canon.make_address(a["Full"])
    assert again == a


@given(urls())
@settings(max_examples=200, deadline=None)
def test_extended_canon_idempotent(u):
    e = canon.extended_canon(u)
    assert e is not None
    assert canon.extended_canon(e) == e
    # extended form has no fragment and sorted query
    assert "#" not in e
    ee = canon.parse_url(e)
    if ee.raw_query:
        parts = ee.raw_query.split("&")
        assert parts == sorted(parts)


@given(urls())
@settings(max_examples=200, deadline=None)
def test_seed_then_address_consistency(u):
    s = canon.canon_seed(u)
    assert s is not None
    # the fragmentless form of the seed key == the Address Full
    a = canon.make_address(u)
    frag_stripped = canon.serialize(canon.parse_url(s), with_fragment=False)
    assert frag_stripped == a["Full"]


@given(urls(), st.from_regex(r"/[a-zA-Z0-9._~\-/]{0,12}(\?[a-z]=[0-9])?", fullmatch=True))
@settings(max_examples=200, deadline=None)
def test_fast_path_equals_urljoin(base, href):
    if "/." in href:
        return
    fast = canon.resolve_address(base, href)
    u = canon.parse_url(urljoin(base, href))
    slow = canon._address_from_parts(u)
    assert fast == slow


# ---------- cuckoo filter model check (hypothesis) ----------


def _cuckoo_table_ops(keys_ins, keys_del, n_buckets=64):
    """Drive the pure-numpy cuckoo core (insert/delete/lookup) without
    Spark, mirroring one shard's mark/delete/probe math exactly."""
    import numpy as np

    from crawlspark import cuckoofilter as cf

    h = np.array([hash(k) & 0xFFFFFFFFFFFFFFFF for k in keys_ins], dtype=np.uint64)
    fp, i1, i2 = cf._fp_and_buckets(h, n_buckets)
    table = np.zeros((n_buckets, cf.SLOTS), dtype=np.uint16)
    overflow = False
    for k in range(len(fp)):
        if not cf._insert_one(table, int(fp[k]), int(i1[k]), n_buckets):
            overflow = True
            break
    if not overflow and keys_del:
        hd = np.array([hash(k) & 0xFFFFFFFFFFFFFFFF for k in keys_del], dtype=np.uint64)
        fpd, d1, d2 = cf._fp_and_buckets(hd, n_buckets)
        for k in range(len(fpd)):
            for i in (int(d1[k]), int(d2[k])):
                slots = (table[i] == fpd[k]).nonzero()[0]
                if len(slots):
                    table[i][slots[0]] = 0
                    break
    return table, overflow, cf


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=12), min_size=0, max_size=120, unique=True)
)
def test_cuckoo_no_false_negatives_property(keys):
    """Model property: after inserting any unique key set (within
    capacity), EVERY inserted key is found (two-bucket lookup).
    Deletion of a subset never removes a surviving key's membership
    unless it fingerprint-collides with a deleted one (checked via
    the model allowing collisions only in that direction)."""
    import numpy as np

    from crawlspark import cuckoofilter as cf

    table, overflow, _ = _cuckoo_table_ops(keys, [])
    if overflow:
        return  # overflow path is covered by the engine unit test
    if not keys:
        assert not table.any()
        return
    h = np.array([hash(k) & 0xFFFFFFFFFFFFFFFF for k in keys], dtype=np.uint64)
    fp, i1, i2 = cf._fp_and_buckets(h, 64)
    found = (table[i1] == fp[:, None]).any(axis=1) | (table[i2] == fp[:, None]).any(axis=1)
    assert found.all()

    # delete half; survivors must still all be found — EXCEPT a
    # survivor that (fp, bucket-pair)-collides with a deleted key,
    # the documented partial-key cuckoo delete caveat (delete() may
    # remove the shared fingerprint copy)
    half = keys[: len(keys) // 2]
    table2, overflow2, _ = _cuckoo_table_ops(keys, half)
    if overflow2:
        return
    survivors = keys[len(keys) // 2:]
    if survivors and half:
        hs = np.array([hash(k) & 0xFFFFFFFFFFFFFFFF for k in survivors], dtype=np.uint64)
        fps, s1, s2 = cf._fp_and_buckets(hs, 64)
        hd = np.array([hash(k) & 0xFFFFFFFFFFFFFFFF for k in half], dtype=np.uint64)
        fpd, d1, d2 = cf._fp_and_buckets(hd, 64)
        collides = (
            (fps[:, None] == fpd[None, :])
            & ((s1[:, None] == d1[None, :]) | (s1[:, None] == d2[None, :]))
        ).any(axis=1)
        found2 = (table2[s1] == fps[:, None]).any(axis=1) | (
            table2[s2] == fps[:, None]
        ).any(axis=1)
        assert (found2 | collides).all()
