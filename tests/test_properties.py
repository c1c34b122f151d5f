"""Property-based tests (hypothesis) over the pure-Python cores.

These pin INVARIANTS rather than examples: URL canonicalization must be
a fixed point (re-canonicalizing canonical output changes nothing — the
crawl's dedup identity depends on it), must never emit fragments, and
must be insensitive to query-parameter order; the cuckoo filter must
never produce a false negative (a false negative = a URL crawled twice,
the bug class round 4's dtype fix closed) under arbitrary insert/delete
workloads, including after state round-trips.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sparkcrawler.functions.urlnorm import canonicalize, host_of
from sparkcrawler.operators.cuckoo import CuckooFilter

# --- URL strategies: hosts/paths/queries from URL-legal alphabets ------

_host = st.from_regex(r"[a-z]([a-z0-9-]{0,10}[a-z0-9])?(\.[a-z]{2,5}){1,2}",
                      fullmatch=True)
_port = st.one_of(st.none(), st.integers(1, 65535))
_pathseg = st.text("abcdefghijklmnopqrstuvwxyz0123456789._~-", min_size=0,
                   max_size=8)
_path = st.lists(_pathseg, min_size=0, max_size=4).map(
    lambda segs: "/" + "/".join(segs) if segs else ""
)
_key = st.text("abcdefghijklmnopqrstuvwxyz", min_size=1, max_size=5)
_val = st.text("abcdefghijklmnopqrstuvwxyz0123456789", min_size=0,
               max_size=5)
_query = st.lists(st.tuples(_key, _val), min_size=0, max_size=4)
_frag = st.one_of(st.none(), st.text("abcdef0123456789", max_size=6))


@st.composite
def http_urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_host)
    port = draw(_port)
    path = draw(_path)
    q = draw(_query)
    frag = draw(_frag)
    url = f"{scheme}://{host}"
    if port is not None:
        url += f":{port}"
    url += path
    if q:
        url += "?" + "&".join(f"{k}={v}" for k, v in q)
    if frag is not None:
        url += "#" + frag
    return url


@settings(max_examples=300, deadline=None)
@given(http_urls())
def test_canonicalize_is_a_fixed_point(url):
    c1 = canonicalize(None, url)
    assert c1 is not None
    c2 = canonicalize(None, c1)
    assert c2 == c1
    # canonical form never carries a fragment
    assert "#" not in c1


@settings(max_examples=200, deadline=None)
@given(_host, _path, _query)
def test_canonicalize_query_order_insensitive(host, path, q):
    def mk(pairs):
        u = f"http://{host}{path}"
        if pairs:
            u += "?" + "&".join(f"{k}={v}" for k, v in pairs)
        return u

    assert canonicalize(None, mk(q)) == canonicalize(None, mk(q[::-1]))


@settings(max_examples=200, deadline=None)
@given(http_urls())
def test_host_of_canonical_is_lowercase_and_stable(url):
    c = canonicalize(None, url)
    h = host_of(c)
    assert h == h.lower()
    assert host_of(c) == host_of(canonicalize(None, c))


@settings(max_examples=100, deadline=None)
@given(http_urls())
def test_default_port_stripped_iff_default(url):
    c = canonicalize(None, url)
    h = host_of(c)
    scheme = c.split(":", 1)[0]
    if ":" in h:
        port = h.rsplit(":", 1)[1]
        default = {"http": "80", "https": "443"}[scheme]
        assert port != default


# --- Cuckoo filter: never a false negative -----------------------------

_hashes = st.lists(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    min_size=1, max_size=400, unique=True,
)


@settings(max_examples=100, deadline=None)
@given(_hashes)
def test_cuckoo_no_false_negatives(hs):
    arr = np.array(hs, dtype=np.int64)
    cf = CuckooFilter.from_hashes(arr)
    assert bool(cf.contains_many(arr).all())


@settings(max_examples=100, deadline=None)
@given(_hashes, st.data())
def test_cuckoo_delete_keeps_remaining_members(hs, data):
    arr = np.array(hs, dtype=np.int64)
    cf = CuckooFilter.from_hashes(arr)
    n_del = data.draw(st.integers(0, len(hs) // 2))
    for h in hs[:n_del]:
        cf.delete(int(h))
    rest = np.array(hs[n_del:], dtype=np.int64)
    if len(rest):
        assert bool(cf.contains_many(rest).all())


@settings(max_examples=50, deadline=None)
@given(_hashes)
def test_cuckoo_state_roundtrip_preserves_membership(hs):
    arr = np.array(hs, dtype=np.int64)
    cf = CuckooFilter.from_hashes(arr)
    cf2 = CuckooFilter.from_state(*cf.to_state())
    assert bool(cf2.contains_many(arr).all())
