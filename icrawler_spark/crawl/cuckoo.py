"""Partitioned Cuckoo seen-filter (north_rule core: "bloom/cuckoo URL-seen").

Drop-in alternative to :mod:`icrawler_spark.crawl.bloom` implementing
partial-key cuckoo hashing (Fan, Andersen, Kaminsky, Mitzenmacher —
"Cuckoo Filter: Practically Better than Bloom", CoNEXT'14): ``m`` buckets of
``b=4`` 16-bit fingerprint slots; an item's two candidate buckets are
``i1 = h(x) & (m-1)`` and ``i2 = i1 XOR h'(fp)`` — from any occupied slot the
*alternate* bucket is recoverable from the fingerprint alone, which is what
makes deletion and same-geometry merges possible.

Why carry a second sketch next to bloom:

- **Deletion.** A bloom bit can never be un-set, so a recrawl that
  invalidates a URL's "seen" status (the reference's monitor loop refetches
  changed pages, ref pbc_monitor.py:1137-1207) would force a full filter
  rebuild; cuckoo removes the fingerprint in O(1) (``delete_many``).
- **Space at low fpp.** At the 16-bit fingerprints used here the false-
  positive rate is ~``2·b/2^16 ≈ 1.2e-4`` in ~18 bits/item at 0.95 load —
  bloom needs ~19.5 bits/item for the same rate, and cuckoo's table is two
  cache lines per query vs k scattered probes.

Correctness contract is identical to bloom's (SURVEY §4 hard-part (f)): the
answer "maybe seen" only *routes* candidates into the exact anti-join; a
false positive costs a redundant exact check, never a dropped URL — and the
engine equality test (cuckoo vs exact-only) asserts the crawl is bit-equal.

Determinism: no RNG anywhere. Hashing reuses bloom's SipHash pair (fixed
keys, process-independent); the kick loop's victim slot is
``(fp + n_kicks) % b`` — a pure function of the colliding state — so two
builds over the same partition produce byte-identical tables.

Scale shape mirrors bloom: per-partition tables built executor-side in
``mapInPandas`` (bulk path vectorized — see ``add_many``), merged on the
driver, broadcast back, applied as a vectorized pandas UDF. At 10^10 URLs
the table is sharded by ``pmod(hash, n_shards)`` exactly like the bloom
sizing note (bloom.py:20-24); merge requires an equal BUCKET count, which
sharding by key guarantees.

Overflow posture (drop-in parity with bloom): a bloom filter past its
sizing degrades gracefully (fpp rises); a textbook cuckoo filter instead
hard-fails once kicks exhaust near full load — an asymmetric failure mode
for what is presented as a drop-in backend. This filter therefore
AUTO-GROWS on overflow by widening each bucket's slot count (b: 4 → 8 →
16 …). Bucket COUNT can never grow without the original keys (i1 takes
fresh bits of h(x) that a stored fingerprint doesn't carry), but slot
count can: lookups scan all slots of the same two candidate buckets, so
fingerprints, deletes, and geometry-equal merges all stay valid, capacity
doubles per growth, and the cost is the documented fpp degradation
(~2·b/2^16 per doubling) — the same graceful contract as an overloaded
bloom, and always correctness-safe here because "maybe seen" only routes
into the exact anti-join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .bloom import _hashes

_BUCKET = 4  # slots per bucket (b); CoNEXT'14's space-optimal choice
_FP_MIX = np.uint64(0x5BD1E995)  # Murmur-ish odd multiplier for h'(fp)


def _fingerprints(h2: np.ndarray) -> np.ndarray:
    """16-bit fingerprints in 1..65535 (0 marks an empty slot)."""
    return (h2 % np.uint64(65535) + np.uint64(1)).astype(np.uint16)


def _alt_index(idx: np.ndarray, fp: np.ndarray, mask: np.uint64) -> np.ndarray:
    """i2 = i1 XOR h'(fp) — an involution, so alt(alt(i)) == i."""
    mixed = (fp.astype(np.uint64) * _FP_MIX) & mask
    # h'(fp) may be 0 only if the mix lands on 0; force a bucket flip so the
    # two candidates are always distinct (keeps the kick loop progressing).
    mixed = np.where(mixed == 0, np.uint64(1), mixed)
    return (idx.astype(np.uint64) ^ mixed) & mask


class CuckooFilter:
    """Fixed-geometry cuckoo filter with vectorized bulk add/contains/delete."""

    MAX_KICKS = 500

    def __init__(self, capacity: int):
        capacity = max(capacity, 16)
        m = 1
        while m * _BUCKET * 0.95 < capacity:  # ≤0.95 load factor
            m *= 2
        self.m = m
        self.mask = np.uint64(m - 1)
        self.table = np.zeros((m, _BUCKET), dtype=np.uint16)
        self.n_items = 0

    # -- internals -------------------------------------------------------------

    def _keys(self, values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        h1, h2 = _hashes(values)
        return (h1 & self.mask), _fingerprints(h2)

    @property
    def n_slots(self) -> int:
        return self.table.shape[1]

    def _grow(self) -> None:
        """Overflow relief: double each bucket's slot count (see module
        docstring — bucket count is frozen by the missing key bits, slot
        count is not). Deterministic, geometry-merge-safe, fpp doubles."""
        self.table = np.hstack(
            [self.table, np.zeros((self.m, self.n_slots), dtype=np.uint16)]
        )

    def _insert_one(self, idx: int, fp: int) -> None:
        """Single insert with the deterministic kick loop (slow path)."""
        i = np.uint64(idx)
        f = np.uint16(fp)
        while True:
            b = self.n_slots
            for kicks in range(self.MAX_KICKS):
                row = self.table[int(i)]
                empty = np.flatnonzero(row == 0)
                if len(empty):
                    row[empty[0]] = f
                    self.n_items += 1
                    return
                # deterministic victim: function of the colliding fingerprint
                # and the kick count only — rebuildable byte-identically.
                slot = (int(f) + kicks) % b
                f, row[slot] = row[slot], f
                i = _alt_index(np.array([i]), np.array([f], dtype=np.uint16), self.mask)[0]
            # kicks exhausted ⇒ load too high for this slot width: widen and
            # retry (the pending fingerprint lands in a fresh empty slot).
            self._grow()

    # -- bulk API (mirrors BloomFilter) ----------------------------------------

    def add_many(self, values: pd.Series) -> None:
        """Bulk insert with MULTISET semantics: every value stores its own
        fingerprint copy, even when two values collide on the same (bucket,
        fingerprint) pair. This is what makes ``delete_many`` exactness-safe
        for the engine: deleting a value added exactly once removes ONE copy,
        so any colliding value still holds its own copy and can never go
        false-negative (an idempotent-skip add would share one copy between
        colliding values — deleting either would silently drop the other).

        The common case is fully vectorized: group items by their i1 bucket,
        rank within the group (argsort + cumcount), and write every item
        whose rank fits the bucket's free slots in one scatter; repeat once
        for i2; only the residue (items whose BOTH buckets filled up this
        batch — a few % below 0.9 load) walks the per-item kick loop."""
        if len(values) == 0:
            return
        i1, fp = self._keys(values)
        leftover_i, leftover_f = self._bulk_place(i1, fp)
        if len(leftover_i):
            alt = _alt_index(leftover_i, leftover_f, self.mask)
            leftover_i, leftover_f = self._bulk_place(alt, leftover_f)
        for i, f in zip(leftover_i, leftover_f):
            self._insert_one(int(i), int(f))

    def _bulk_place(self, idx: np.ndarray, fp: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Vectorized 'first empty slots' placement; returns what didn't fit."""
        if len(idx) == 0:
            return idx, fp
        order = np.argsort(idx, kind="stable")
        si, sf = idx[order], fp[order]
        # rank of each item within its bucket group (0,1,2,... per bucket)
        starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
        rank = np.arange(len(si)) - np.repeat(starts, np.diff(np.r_[starts, len(si)]))
        free = (self.table[si.astype(np.int64)] == 0).sum(axis=1)
        fits = rank < free
        # scatter the fitting items into their bucket's empty slots, one slot
        # position at a time (≤ n_slots scatters, each fully vectorized)
        for r in range(self.n_slots):
            sel = fits & (rank == r)
            if not sel.any():
                continue
            rows = si[sel].astype(np.int64)
            # lower ranks are already written, so each rank-r item takes the
            # FIRST currently-empty slot of its bucket (guaranteed to exist:
            # rank < free-at-start ⇒ free-now = free-at-start − r ≥ 1)
            slot_is_zero = self.table[rows] == 0
            slot_pos = np.argmax(slot_is_zero, axis=1)
            self.table[rows, slot_pos] = sf[sel]
            self.n_items += int(sel.sum())
        return si[~fits], sf[~fits]

    def _contains_keys(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        i2 = _alt_index(i1, fp, self.mask)
        b1 = self.table[i1.astype(np.int64)]
        b2 = self.table[i2.astype(np.int64)]
        f = fp[:, None]
        return ((b1 == f) | (b2 == f)).any(axis=1)

    def might_contain_many(self, values: pd.Series) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        i1, fp = self._keys(values)
        return self._contains_keys(i1, fp)

    def delete_many(self, values: pd.Series) -> np.ndarray:
        """Remove one matching fingerprint per value; returns a bool mask of
        which values were found. Safe for any value added exactly once and
        not yet deleted (multiset adds guarantee it holds its own copy, so no
        OTHER value can go false-negative). Deleting a never-added value can,
        with fpp probability, evict a colliding item's copy — callers must
        intersect with the known-added set first (the engine intersects with
        ``visited``)."""
        out = np.zeros(len(values), dtype=bool)
        if len(values) == 0:
            return out
        i1, fp = self._keys(values)
        i2 = _alt_index(i1, fp, self.mask)
        for j in range(len(values)):
            f = fp[j]
            for i in (int(i1[j]), int(i2[j])):
                row = self.table[i]
                hit = np.flatnonzero(row == f)
                if len(hit):
                    row[hit[0]] = 0
                    self.n_items -= 1
                    out[j] = True
                    break
        return out

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """OR-equivalent for cuckoo: re-insert every occupied slot of
        ``other``. The slot's own bucket index is one of the fingerprint's two
        candidates, so geometry-equal tables merge without the original keys."""
        assert self.m == other.m, "cuckoo merge requires an equal bucket count"
        occ_i, occ_slot = np.nonzero(other.table)
        fps = other.table[occ_i, occ_slot]
        if len(occ_i):
            # every occupied slot re-inserts (multiset-preserving: no dedup
            # against self — see add_many's deletion-safety contract)
            idx = occ_i.astype(np.uint64)
            lo_i, lo_f = self._bulk_place(idx, fps)
            if len(lo_i):
                alt = _alt_index(lo_i, lo_f, self.mask)
                lo_i, lo_f = self._bulk_place(alt, lo_f)
            for i, f in zip(lo_i, lo_f):
                self._insert_one(int(i), int(f))
        return self

    # -- serialization for driver↔executor transfer ----------------------------

    def to_bytes(self) -> bytes:
        head = np.array([self.m, self.n_items], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        m, n_items = np.frombuffer(data[:16], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.m = int(m)
        obj.mask = np.uint64(m - 1)
        # slot count is implied by the payload length, so pre-growth blobs
        # (b=4) and grown blobs round-trip through the same header
        slots = (len(data) - 16) // (2 * int(m))
        obj.table = np.frombuffer(data[16:], dtype=np.uint16).reshape(int(m), slots).copy()
        obj.n_items = int(n_items)
        return obj


# module-interface alias (see bloom.py): the engine resolves the selected
# backend's serialized class through ``Filter.from_bytes``.
Filter = CuckooFilter


def build_filter(df, col: str, capacity: int, fpp: float = 0.01):
    """Distributed build, same shape as ``bloom.build_bloom``: per-partition
    tables in executors (mapInPandas), geometry-equal merge on the driver.

    ``fpp`` is accepted for interface parity; the 16-bit fingerprint fixes
    the rate at ~1.2e-4 (better than any fpp the engine passes)."""
    from pyspark.sql.types import BinaryType, StructField, StructType

    schema = StructType([StructField("sketch", BinaryType())])

    def per_partition(batches):
        cf = CuckooFilter(capacity)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                cf.add_many(pdf[col])
        if any_rows:
            yield pd.DataFrame({"sketch": [cf.to_bytes()]})

    parts = df.select(col).mapInPandas(per_partition, schema).collect()
    merged = CuckooFilter(capacity)
    for row in parts:
        merged.merge(CuckooFilter.from_bytes(bytes(row.sketch)))
    return merged


def prefilter_unseen(df, col: str, sketch_bytes_bc):
    """Split df into (definitely_new, maybe_seen) using the broadcast filter —
    identical contract to ``bloom.prefilter_unseen``."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def might_contain(vals: pd.Series) -> pd.Series:
        cf = CuckooFilter.from_bytes(bytes(sketch_bytes_bc.value))
        return pd.Series(cf.might_contain_many(vals))

    return df.withColumn("_maybe_seen", might_contain(df[col]))
