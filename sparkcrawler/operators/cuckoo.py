"""Per-host cuckoo filters for hot domains (SURVEY.md §2 J1 scale row,
north-star "partitioned Bloom-filter URL-seen set with per-host cuckoo
filters for hot domains").

Why a second filter type: a crawl's duplicate-link volume is dominated
by a few hot hosts (every page of a host links to the same nav/footer
URLs). The shared Bloom's false-positive rate is a function of its
global fill, so precisely the hosts that generate the most candidates
also send the most needless "suspects" to the exact anti-join. A
per-host **cuckoo filter** (Fan et al., CoNEXT 2014 — public
literature) holds 16-bit fingerprints in 4-slot buckets with two
candidate buckets per key: near-exact membership (FP ≈ 2⁻¹³ at 95%
load), O(1) lookups, and — unlike Bloom — **deletion** support, which
a frontier that evicts or re-prioritizes entries needs.

Composition contract (:class:`HotHostSeenFilter`): hot hosts answer
from their cuckoo filter (complete for that host — built from the
committed seen snapshots at promotion time, then fed every round's
delta); all other hosts fall back to the shared Bloom. Both layers
only ever SKIP definite-misses, so dedup correctness is unchanged
(verified against the plain anti-join in tests).

Scale note: filters here are driver-resident and broadcast (the
sandbox regime, same as PartitionedBloom); at the 10^10 design point
the same per-host tables live executor-side exactly like
DistributedBloom's shard bitmaps — the layout is host-keyed rows
consulted via cogroup, and the code path that routes hot hosts to
their own table is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import BooleanType

_FP_MIX = np.uint64(0x9E3779B97F4A7C15)
_ALT_MIX = 0x5BD1E995


def _fingerprints(hs: np.ndarray) -> np.ndarray:
    """16-bit nonzero fingerprint per 64-bit hash (vectorized)."""
    with np.errstate(over="ignore"):
        v = hs.astype(np.int64).astype(np.uint64) * _FP_MIX
        fp = ((v >> np.uint64(48)) ^ (v >> np.uint64(16))).astype(np.uint16)
    fp = fp.copy()
    fp[fp == 0] = 1
    return fp


class CuckooFilter:
    """Partial-key cuckoo filter: 4-slot buckets of uint16 fingerprints,
    bucket₂ = bucket₁ XOR h(fp). Slot 0 means empty."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1024):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        self._kick_state = 0x9E3779B9  # deterministic eviction choices

    # ------------------------------------------------------------ helpers --

    def _i1(self, hs: np.ndarray) -> np.ndarray:
        return (
            hs.astype(np.int64).astype(np.uint64)
            % np.uint64(self.n_buckets)
        ).astype(np.int64)

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ ((int(fp) * _ALT_MIX) & 0x7FFFFFFF)) % self.n_buckets

    # ------------------------------------------------------------- insert --

    def _try_put(self, i: int, fp: int) -> bool:
        row = self.table[i]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return True
        return False

    def insert(self, h: int) -> bool:
        fp = int(_fingerprints(np.array([h]))[0])
        i1 = int(self._i1(np.array([h]))[0])
        i2 = self._alt(i1, fp)
        if self._try_put(i1, fp) or self._try_put(i2, fp):
            self.count += 1
            return True
        # evict: kick a resident fingerprint to its alternate bucket
        i = i1 if (self._kick_state & 1) else i2
        for _ in range(self.MAX_KICKS):
            self._kick_state = (self._kick_state * 1103515245 + 12345) & 0x7FFFFFFF
            slot = self._kick_state % self.SLOTS
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt(i, fp)
            if self._try_put(i, fp):
                self.count += 1
                return True
        return False  # table effectively full — caller resizes

    def insert_many(self, hs: np.ndarray) -> bool:
        for h in hs.tolist():
            if not self.insert(int(h)):
                return False
        return True

    # -------------------------------------------------------------- query --

    def contains_many(self, hs: np.ndarray) -> np.ndarray:
        """Vectorized membership (no false negatives for inserted keys)."""
        if hs.size == 0:
            return np.zeros(0, dtype=bool)
        fp = _fingerprints(hs)
        i1 = self._i1(hs)
        alt = (
            i1.astype(np.uint64)
            ^ ((fp.astype(np.uint64) * np.uint64(_ALT_MIX)) & np.uint64(0x7FFFFFFF))
        ) % np.uint64(self.n_buckets)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[alt.astype(np.int64)] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def contains(self, h: int) -> bool:
        return bool(self.contains_many(np.array([h], dtype=np.int64))[0])

    # ------------------------------------------------------------- delete --

    def delete(self, h: int) -> bool:
        """Remove ONE copy of the key's fingerprint (the operation Bloom
        cannot do) — used by frontier-eviction / re-prioritization
        workflows."""
        fp = int(_fingerprints(np.array([h]))[0])
        i1 = int(self._i1(np.array([h]))[0])
        for i in (i1, self._alt(i1, fp)):
            row = self.table[i]
            where = np.nonzero(row == fp)[0]
            if where.size:
                row[where[0]] = 0
                self.count -= 1
                return True
        return False

    # ------------------------------------------------------------- sizing --

    @classmethod
    def sized_for(cls, n: int, load: float = 0.8) -> "CuckooFilter":
        need = max(int(n / (cls.SLOTS * load)) + 1, 16)
        nb = 1 << (need - 1).bit_length()
        return cls(nb)

    @classmethod
    def from_hashes(cls, hs: np.ndarray) -> "CuckooFilter":
        """Build (resizing on insert failure) from a hash array."""
        f = cls.sized_for(max(hs.size, 1))
        while not f.insert_many(hs):
            f = cls(f.n_buckets * 2)
        return f


class HotHostSeenFilter:
    """Bloom for the cold tail + per-host cuckoo filters for hot hosts,
    speaking the same ``tag_maybe`` protocol as the Blooms (anything
    with ``tag_maybe``/``n_added`` plugs into ``dedup_against_seen``).

    A hot host's answer comes ONLY from its cuckoo filter, which the
    crawl keeps complete for that host — so a cuckoo miss is a definite
    miss (no false negatives) and hot-host suspects all but vanish.
    """

    def __init__(self, bloom, filters: dict[str, CuckooFilter]):
        self.bloom = bloom
        self.filters = filters

    @property
    def n_added(self) -> int:
        return self.bloom.n_added

    def tag_maybe(self, candidates: DataFrame, spark: SparkSession) -> DataFrame:
        tagged = self.bloom.tag_maybe(candidates, spark)
        if not self.filters:
            return tagged
        bc = spark.sparkContext.broadcast(
            {h: (f.n_buckets, f.table) for h, f in self.filters.items()}
        )

        @F.pandas_udf(BooleanType())
        def override(host: pd.Series, url_hash: pd.Series,
                     bloom_maybe: pd.Series) -> pd.Series:
            tables = bc.value
            out = bloom_maybe.to_numpy(dtype=bool).copy()
            hosts = host.to_numpy()
            hs = url_hash.to_numpy(dtype=np.int64)
            for h in pd.unique(hosts):
                t = tables.get(h)
                if t is None:
                    continue
                f = CuckooFilter(t[0])
                f.table = t[1]
                mask = hosts == h
                out[mask] = f.contains_many(hs[mask])
            return pd.Series(out)

        return tagged.withColumn(
            "_maybe",
            override(F.col("host"), F.col("url_hash"), F.col("_maybe")),
        )
