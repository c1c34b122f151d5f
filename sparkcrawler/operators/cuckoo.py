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

Two regimes, matching the Bloom's (plans/crawl.py chooses): small
rounds under a broadcast Bloom keep the tables driver-resident and
broadcast (:class:`HotHostSeenFilter`); the 10^10 design point —
distributed Bloom, or any round too big for a driver fold — runs
:class:`DistributedHotHostFilter`, where the same per-host tables live
EXECUTOR-SIDE as host-keyed state rows consulted and updated via
cogroup, exactly like DistributedBloom's shard bitmaps. A crawl that
outgrows the driver regime migrates its filters executor-side rather
than demoting them.
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
        # victim cache: (bucket, fp) pairs displaced by a failed insert's
        # kick chain. Standard cuckoo-filter stash — keeps the "no false
        # negatives" contract even for a saturated filter (an insert that
        # returns False signals "resize recommended", never corruption).
        self.stash: list[tuple[int, int]] = []

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
        # table effectively full: the NEW key is resident (the first kick
        # swapped it in); the homeless victim — some OLDER resident — goes
        # to the stash so no previously-inserted key is ever lost. False
        # tells the caller a resize/rebuild is recommended.
        self.stash.append((i, fp))
        self.count += 1
        return False

    def insert_many(self, hs: np.ndarray) -> bool:
        """Insert every hash (none are dropped — overflow victims land in
        the stash). Returns False if ANY insert saturated, i.e. the
        caller should rebuild at a larger size when convenient."""
        ok = True
        for h in hs.tolist():
            ok = self.insert(int(h)) and ok
        return ok

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
        hit = hit1 | hit2
        for b, sfp in self.stash:  # victim cache (tiny; usually empty)
            hit |= (fp == sfp) & ((i1 == b) | (alt.astype(np.int64) == b))
        return hit

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
        for j, (b, sfp) in enumerate(self.stash):
            if sfp == fp and b in (i1, self._alt(i1, fp)):
                del self.stash[j]
                self.count -= 1
                return True
        return False

    # -------------------------------------------- executor-side state rows --

    def to_state(self) -> tuple[int, int, bytes, bytes]:
        """(n_buckets, count, table_bytes, stash_bytes) — the serialized
        form shipped in DistributedHotHostFilter's per-host rows."""
        stash = np.asarray(self.stash or [], dtype=np.int64).reshape(-1)
        return (
            self.n_buckets,
            self.count,
            np.ascontiguousarray(self.table).tobytes(),
            stash.tobytes(),
        )

    @classmethod
    def from_state(
        cls, n_buckets: int, count: int, table: bytes, stash: bytes = b""
    ) -> "CuckooFilter":
        f = cls(n_buckets)
        f.table = (
            np.frombuffer(table, dtype=np.uint16)
            .reshape(n_buckets, cls.SLOTS)
            .copy()
        )
        f.count = count
        pairs = np.frombuffer(stash, dtype=np.int64).reshape(-1, 2)
        f.stash = [(int(b), int(fp)) for b, fp in pairs]
        return f

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
        self._bc = None  # current round's broadcast of the hot tables

    @property
    def n_added(self) -> int:
        return self.bloom.n_added

    def tag_maybe(self, candidates: DataFrame, spark: SparkSession) -> DataFrame:
        tagged = self.bloom.tag_maybe(candidates, spark)
        if not self.filters:
            return tagged
        # reclaim the previous round's broadcast before shipping a new
        # one (its actions are complete by the time the next round plans)
        # — otherwise a long crawl accretes one table-sized broadcast per
        # round on the driver and every executor.
        if self._bc is not None:
            self._bc.unpersist(blocking=False)
        bc = spark.sparkContext.broadcast(
            {h: f.to_state() for h, f in self.filters.items()}
        )
        self._bc = bc

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
                f = CuckooFilter.from_state(*t)
                mask = hosts == h
                out[mask] = f.contains_many(hs[mask])
            return pd.Series(out)

        return tagged.withColumn(
            "_maybe",
            override(F.col("host"), F.col("url_hash"), F.col("_maybe")),
        )

    def release(self) -> None:
        """Destroy the last broadcast (crawl end / filter retirement)."""
        if self._bc is not None:
            self._bc.destroy()
            self._bc = None


_STATE_SCHEMA = "host string, n_buckets int, n long, table binary, stash binary"


class DistributedHotHostFilter:
    """Per-host cuckoo filters whose tables NEVER leave the executors —
    the :class:`~sparkcrawler.operators.seen.DistributedBloom` pattern
    applied to the hot-host layer, so "per-host cuckoo filters for hot
    domains" holds in exactly the regime the 10^10 design point needs
    (rounds too big for a driver fold, Bloom bitmaps living
    executor-side).

    State is a persisted ``(host, n_buckets, n, table, stash)``
    DataFrame, one row per hot host:

    - **build** (:meth:`ensure_hosts`): filters for newly promoted hosts
      are built executor-side from the committed seen snapshots — one
      ``groupBy(host).applyInPandas`` task per host, exact and complete
      by construction.
    - **update** (:meth:`update_from_df`): each round's new-URL delta,
      restricted to the hot hosts, cogroups with the state rows; one
      task per host merges the delta into that host's table. A
      saturated table stays CORRECT (overflow victims go to the
      filter's stash — no false negatives, see
      :meth:`CuckooFilter.insert`), so a merge never needs the original
      hashes; hosts whose stash outgrew ``STASH_REBUILD`` are rebuilt
      exact from the seen snapshots in the same pass structure.
    - **consult** (:meth:`tag_maybe`): after the Bloom tag, candidate
      rows of hot hosts cogroup with their host's single state row and
      the cuckoo answer REPLACES the Bloom's (complete per host → a
      miss is a definite miss); cold hosts pass through untouched,
      JVM-side.

    The driver only ever holds the hot host NAMES (≤ the configured
    top-K) — never a table, never a hash column.
    """

    STASH_REBUILD = 64

    def __init__(self, spark: SparkSession, bloom):
        self.spark = spark
        self.bloom = bloom
        self.hosts: set[str] = set()
        self.tables_df: DataFrame | None = None  # persisted state rows
        # hosts whose driver-resident filters are being migrated here
        # (crawl.py sets this when a big round flips the regime)
        self.hosts_migrating: set[str] = set()

    @property
    def n_added(self) -> int:
        return self.bloom.n_added

    # ------------------------------------------------------------ build --

    @staticmethod
    def _build_rows(pdf: pd.DataFrame) -> pd.DataFrame:
        host = pdf["host"].iloc[0]
        f = CuckooFilter.from_hashes(
            pdf["url_hash"].to_numpy(dtype=np.int64)
        )
        nb, n, table, stash = f.to_state()
        return pd.DataFrame(
            {"host": [host], "n_buckets": [nb], "n": [n],
             "table": [table], "stash": [stash]}
        )

    def _swap_state(self, new: DataFrame) -> list:
        """Persist + materialize the new state, drop the old, and return
        the tiny (host, n_buckets) manifest — ONE action does both the
        materialization and the saturation check (never the tables)."""
        new = new.persist()
        manifest = new.select("host", "n_buckets").collect()
        if self.tables_df is not None:
            self.tables_df.unpersist()
        self.tables_df = new
        return manifest

    def ensure_hosts(self, hosts, seen_df: DataFrame) -> None:
        """Promote ``hosts`` (build exact filters from ``seen_df`` —
        the full seen set including the current round). Hosts already
        held are untouched; no-op when nothing is new."""
        missing = sorted(set(hosts) - self.hosts)
        if not missing:
            return
        built = (
            seen_df.where(F.col("host").isin(missing))
            .select("host", "url_hash")
            .groupBy("host")
            .applyInPandas(self._build_rows, schema=_STATE_SCHEMA)
        )
        new = (
            built
            if self.tables_df is None
            else self.tables_df.unionByName(built)
        )
        manifest = self._swap_state(new)
        # only count hosts that actually produced a state row: a host
        # with zero seen rows builds nothing, and admitting it to
        # self.hosts would have it permanently Bloom-fallback while
        # inflating hot_active (and its first delta would hit the
        # no-state-row path in update_from_df)
        self.hosts.update(set(missing) & {r["host"] for r in manifest})

    # ----------------------------------------------------------- update --

    def update_from_df(self, new_rows: DataFrame, seen_df: DataFrame) -> None:
        """Fold a round's new-URL delta into the hot tables, one
        host-local task each. ``seen_df`` (seen set INCLUDING the delta)
        feeds the in-task exact rebuild of any host whose table
        saturated past the stash threshold."""
        if not self.hosts or self.tables_df is None:
            return
        hot = sorted(self.hosts)
        delta = new_rows.where(F.col("host").isin(hot)).select(
            "host", "url_hash"
        )
        rebuild_limit = self.STASH_REBUILD

        def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if right.empty:
                # delta for a host with no state row (unreachable via
                # crawl(): ensure_hosts admits only hosts with built
                # rows — but reachable for direct API users). Dropping
                # it would silently lose the delta; a delta-only filter
                # would violate the consult's completeness contract
                # (miss == definitely unseen). Emit the delta-only
                # filter flagged n_buckets=0, which the saturated-host
                # pass below rebuilds EXACT from seen_df before this
                # update returns.
                f = CuckooFilter.from_hashes(
                    left["url_hash"].to_numpy(dtype=np.int64)
                )
                _, n, table, stash = f.to_state()
                return pd.DataFrame(
                    {"host": [left["host"].iloc[0]], "n_buckets": [0],
                     "n": [n], "table": [table], "stash": [stash]}
                )
            r = right.iloc[0]
            if left.empty:
                return right
            f = CuckooFilter.from_state(
                int(r["n_buckets"]), int(r["n"]), r["table"], r["stash"]
            )
            f.insert_many(left["url_hash"].to_numpy(dtype=np.int64))
            if len(f.stash) > rebuild_limit:
                # saturated: signal the driver-side rebuild pass below by
                # zeroing n_buckets (the row stays correct via the full
                # table+stash, so consults before the rebuild are safe)
                nb, n, table, stash = f.to_state()
                return pd.DataFrame(
                    {"host": [r["host"]], "n_buckets": [0], "n": [n],
                     "table": [table], "stash": [stash]}
                )
            nb, n, table, stash = f.to_state()
            return pd.DataFrame(
                {"host": [r["host"]], "n_buckets": [nb], "n": [n],
                 "table": [table], "stash": [stash]}
            )

        merged = (
            delta.groupBy("host")
            .cogroup(self.tables_df.groupBy("host"))
            .applyInPandas(merge, schema=_STATE_SCHEMA)
        )
        manifest = self._swap_state(merged)
        # rare exact rebuild of saturated hosts (from the same tiny
        # manifest the materialization action already returned)
        saturated = [r["host"] for r in manifest if r["n_buckets"] == 0]
        if saturated:
            rebuilt = (
                seen_df.where(F.col("host").isin(saturated))
                .select("host", "url_hash")
                .groupBy("host")
                .applyInPandas(self._build_rows, schema=_STATE_SCHEMA)
            )
            self._swap_state(
                self.tables_df.where(F.col("n_buckets") > 0).unionByName(rebuilt)
            )

    # ---------------------------------------------------------- consult --

    def tag_maybe(self, candidates: DataFrame, spark: SparkSession) -> DataFrame:
        tagged = self.bloom.tag_maybe(candidates, spark)
        if not self.hosts or self.tables_df is None:
            return tagged
        hot = sorted(self.hosts)
        cold = tagged.where(~F.col("host").isin(hot))
        cand_hot = tagged.where(F.col("host").isin(hot))
        out_schema = tagged.schema

        def check(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if left.empty:
                return left
            if right.empty:  # promoted this instant, state row not yet visible
                return left
            r = right.iloc[0]
            # a rebuild-pending row (n_buckets==0) still carries the full
            # correct table+stash; its true size is len(table)/(2·SLOTS)
            nb = int(r["n_buckets"]) or len(r["table"]) // (2 * CuckooFilter.SLOTS)
            f = CuckooFilter.from_state(nb, int(r["n"]), r["table"], r["stash"])
            left = left.copy()
            left["_maybe"] = f.contains_many(
                left["url_hash"].to_numpy(dtype=np.int64)
            )
            return left

        checked = (
            cand_hot.groupBy("host")
            .cogroup(self.tables_df.groupBy("host"))
            .applyInPandas(check, schema=out_schema)
        )
        return cold.unionByName(checked)

    def release(self) -> None:
        if self.tables_df is not None:
            self.tables_df.unpersist()
            self.tables_df = None
