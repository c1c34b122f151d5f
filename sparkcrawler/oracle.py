"""Pure-Python crawl oracle (SURVEY.md §5 strategy #2).

A ~100-line re-statement of the reference's crawl semantics distilled
from its test suite (dedup-gated frontier, robots gate with
allow-on-missing, max_pages stop, BFS-by-round discovery) used to
differentially test the Spark engine: visit set, per-URL BFS depth,
and seen set must match exactly.

Includes a pure-Python XXH64 (seed 42) that reproduces Spark's builtin
``xxhash64`` on UTF-8 strings, so the oracle sorts by the *same*
deterministic total order (depth, priority, url_hash, url) the engine
uses for max_pages trimming and politeness ranking.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from urllib.parse import urlsplit

from sparkcrawler.functions.extract import oracle_links
from sparkcrawler.functions.urlnorm import canonicalize, host_of

_M = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Standard XXH64; Spark's ``xxhash64`` uses seed=42 on UTF-8 bytes."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for j, v in enumerate((v1, v2, v3, v4)):
                word = int.from_bytes(data[i + 8 * j : i + 8 * j + 8], "little")
                if j == 0:
                    v1 = _round(v, word)
                elif j == 1:
                    v2 = _round(v, word)
                elif j == 2:
                    v3 = _round(v, word)
                else:
                    v4 = _round(v, word)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        word = int.from_bytes(data[i : i + 8], "little")
        h ^= _round(0, word)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        word = int.from_bytes(data[i : i + 4], "little")
        h ^= (word * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def url_hash64(url: str) -> int:
    """Signed 64-bit, matching Spark's LongType xxhash64."""
    h = xxh64(url.encode("utf-8"))
    return h - (1 << 64) if h >= (1 << 63) else h


@dataclass(frozen=True)
class Entry:
    url: str
    url_hash: int
    host: str
    depth: int
    priority: float
    attempt: int = 0

    @property
    def order_key(self):
        return (self.depth, self.priority, self.url_hash, self.url)


@dataclass
class OracleResult:
    log: list[dict]            # crawl_log analog
    seen: set[str]             # every URL ever admitted to the frontier
    rounds: int
    visited: int

    @property
    def visit_depths(self) -> dict[str, int]:
        return {row["url"]: row["depth"] for row in self.log}

    @property
    def parsed_urls(self) -> set[str]:
        return {r["url"] for r in self.log if r["crawl_status"] == 2}


def _disallowed(entry: Entry, robots: dict) -> bool:
    rule = robots.get(entry.host)
    if rule is None:
        return False  # allow-on-error default (reference downloader.py:34)
    prefixes = rule.get("disallow_prefixes") or []
    path = urlsplit(entry.url).path or "/"
    return any(path.startswith(p) for p in prefixes)


_BACKOFF_BASE_DELAY = 10.0  # == plans.round.BACKOFF_BASE_DELAY
_BACKOFF_FACTOR = 1.5       # == plans.round.BACKOFF_FACTOR


def _page_of(pages: dict, url: str):
    """(html, status_code) — corpus values are bytes (status implied
    200) or dicts with optional ``status_code`` (WARC-style corpus)."""
    v = pages.get(url)
    if v is None:
        return None, None
    if isinstance(v, dict):
        return v.get("html"), v.get("status_code")
    return v, None


def simulate(
    pages: dict[str, object],
    robots: dict[str, dict],
    seed_urls: list[str],
    max_pages: int = 10,
    round_seconds: float = 60.0,
    retries: int = 1,
    max_rounds: int = 1000,
) -> OracleResult:
    """Reference-semantics BFS crawl over an in-memory corpus."""
    frontier: list[Entry] = []
    seen: set[str] = set()
    for u in seed_urls:
        cu = canonicalize(None, u)
        if cu and cu not in seen:
            seen.add(cu)
            frontier.append(Entry(cu, url_hash64(cu), host_of(cu), 0, 0.0))

    log: list[dict] = []
    visited = 0
    rounds = 0
    backoff_k: dict[str, int] = {}  # host -> rounds with >=1 429 observed
    while frontier and visited < max_pages and rounds < max_rounds:
        remaining = max_pages - visited
        pool = sorted(frontier, key=lambda e: e.order_key)
        if len(pool) > remaining:
            pool = pool[:remaining]  # deterministic max_pages trim

        allowed, disallowed = [], []
        for e in pool:
            (disallowed if _disallowed(e, robots) else allowed).append(e)

        # per-host politeness budget (hosts with a crawl_delay and/or a
        # 429 backoff history; backoff inflates the effective delay)
        admitted, deferred = [], []
        taken: dict[str, int] = {}
        for e in allowed:  # already in order_key order
            rule = robots.get(e.host) or {}
            delay = rule.get("crawl_delay")
            k = backoff_k.get(e.host, 0)
            if k:
                delay = max(delay or 0.0, _BACKOFF_BASE_DELAY) * (
                    _BACKOFF_FACTOR ** (k - 1)
                )
            if delay and delay > 0:
                budget = max(int(round_seconds // delay), 1)
                if taken.get(e.host, 0) >= budget:
                    deferred.append(e)
                    continue
                taken[e.host] = taken.get(e.host, 0) + 1
            admitted.append(e)

        discovered: list[Entry] = []
        in_round: set[str] = set()
        round_429_hosts: set[str] = set()
        for e in disallowed:
            log.append(
                {"url": e.url, "depth": e.depth, "round": rounds,
                 "crawl_status": -1, "status_code": 403, "links": None}
            )
            visited += 1
        for e in admitted:
            html, status = _page_of(pages, e.url)
            if html is None:
                if e.attempt + 1 < retries:
                    deferred.append(replace(e, attempt=e.attempt + 1))
                else:
                    log.append(
                        {"url": e.url, "depth": e.depth, "round": rounds,
                         "crawl_status": -2, "status_code": 404, "links": None}
                    )
                    visited += 1
                continue
            if status == 429:
                # rate-limited: backoff next round; bounded retry
                round_429_hosts.add(e.host)
                if e.attempt + 1 < retries:
                    # non-terminal observation row (engine logs it too)
                    log.append(
                        {"url": e.url, "depth": e.depth, "round": rounds,
                         "crawl_status": 0, "status_code": 429, "links": None}
                    )
                    deferred.append(replace(e, attempt=e.attempt + 1))
                else:
                    log.append(
                        {"url": e.url, "depth": e.depth, "round": rounds,
                         "crawl_status": -2, "status_code": 429, "links": None}
                    )
                    visited += 1
                continue
            if status is not None and status != 200:
                log.append(
                    {"url": e.url, "depth": e.depth, "round": rounds,
                     "crawl_status": -2, "status_code": status, "links": None}
                )
                visited += 1
                continue
            links = oracle_links(e.url, html)
            log.append(
                {"url": e.url, "depth": e.depth, "round": rounds,
                 "crawl_status": 2, "status_code": 200, "links": links}
            )
            visited += 1
            for link in links:
                if link in in_round or link in seen:
                    continue
                in_round.add(link)
                discovered.append(
                    Entry(link, url_hash64(link), host_of(link), e.depth + 1, 1.0)
                )

        for e in discovered:
            seen.add(e.url)
        for h in round_429_hosts:
            backoff_k[h] = backoff_k.get(h, 0) + 1
        frontier = deferred + discovered
        rounds += 1

    return OracleResult(log=log, seen=seen, rounds=rounds, visited=visited)
