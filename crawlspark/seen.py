"""URL-seen set: exact anti-join authority + bloom/cuckoo probabilistic tiers.

Reference analog: the response cache doubling as fetch-dedup — `Cacher`
(services.go:37-41) keyed by md5(method:fullURL[+body]) (job.go:117-130).
The engine keeps that exact key (cache_key) as the dedup authority and adds
the north-rule tiers keyed by xxhash64(url_canon):

  tier 1 — partitioned Bloom filters (immutable, historical): one bitset per
           pmod(url_hash, P) range, built distributed via applyInPandas,
           OR-merged across waves. At 10^10 keys the per-partition bitsets
           stay bounded (P scales with the frontier) and membership probes
           broadcast only the bitsets, never the keys.
  tier 2 — cuckoo overflow (small, mutable, recent): holds keys added since
           the last bloom rebuild; supports deletion, so a wave that aborts
           before its manifest commit can release its speculative keys.
           Bounded by rebuild_interval × wave_budget fingerprints → always
           broadcastable.
  tier 3 — exact left-anti join on cache_key: the authority. The filters
           only cut the join's left side (a candidate flagged definitely-new
           by both tiers skips the shuffle entirely); they can never change
           the answer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _probe_positions(hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    """k independently-mixed probe positions per key (k × n matrix).

    splitmix64 finalizer per probe index — naive double hashing (h1 + i*h2)
    degenerates into arithmetic progressions mod m and measurably inflates
    the false-positive rate (observed 7.6% where theory says ~1e-6)."""
    h = hashes.astype(np.uint64)
    idx = np.arange(1, k + 1, dtype=np.uint64).reshape(-1, 1)
    x = h + idx * _GOLD
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x % np.uint64(m_bits)).astype(np.int64)


class PartitionedBloom:
    """P independent bloom bitsets, partition = pmod(url_hash, P)."""

    def __init__(self, n_partitions: int = 16, m_bits: int = 1 << 20, k: int = 5):
        self.n_partitions = n_partitions
        self.m_bits = m_bits
        self.k = k
        self.bitsets = {p: np.zeros(m_bits // 8, dtype=np.uint8) for p in range(n_partitions)}
        self._cat: np.ndarray | None = None  # concatenated packed bitsets (probe cache)

    def delta_agg_df(self, df: DataFrame, hash_col: str = "url_hash") -> DataFrame:
        """LAZY distributed bitset build: per-partition bitsets computed by
        applyInPandas (each group sees only its hash range), returned as a
        ≤P-row (p, bitset) frame. The engine unions this into the wave's
        single fused action (round 5), so tier maintenance rides the job the
        wave already pays instead of a dedicated 1-3 s driver round-trip per
        wave; merge the collected rows with `merge_rows`."""
        P, m, k = self.n_partitions, self.m_bits, self.k

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            bits = np.zeros(m, dtype=bool)
            pos = _probe_positions(pdf["h"].to_numpy(np.int64), m, k)
            bits[pos.ravel()] = True
            pid = int(pdf["p"].iloc[0])
            return pd.DataFrame({"p": [pid], "bitset": [np.packbits(bits).tobytes()]})

        return (
            df.select(F.col(hash_col).alias("h"))
            .withColumn("p", F.pmod(F.col("h"), F.lit(P)).cast("int"))
            .groupBy("p")
            .applyInPandas(build, schema="p int, bitset binary")
        )

    def merge_rows(self, rows) -> None:
        """OR collected (p, bitset) rows — from delta_agg_df — into the tier."""
        for r in rows:
            self.bitsets[r["p"]] = self.bitsets[r["p"]] | np.frombuffer(
                r["bitset"], dtype=np.uint8
            )
        self._cat = None

    def add_from_df(self, df: DataFrame, hash_col: str = "url_hash") -> None:
        """Eager build: delta_agg_df + collect + merge (the one-time full
        catch-up sync; per-wave deltas ride the fused action instead)."""
        self.merge_rows(self.delta_agg_df(df, hash_col).collect())

    def might_contain(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for a numpy batch of int64 hashes.

        Probes the PACKED bitsets directly — k gather loads of one byte per
        key from a cached concatenation of all P bitsets. The previous
        implementation np.unpackbits'ed each partition's full bitset per
        call: at 2 MB/partition × 16 partitions × one call per 256-row Arrow
        batch that was ~1 MB of DRAM writes PER ROW (measured 94.6 s per 1M
        probes; this path: 1.9 s, bit-identical — see BENCH/BASELINE.md §2n).
        O(k) bytes touched per key, independent of m_bits and batch size."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        if self._cat is None:
            self._cat = np.concatenate(
                [self.bitsets[p] for p in range(self.n_partitions)]
            )
        # np.mod with a positive divisor is already non-negative for negative
        # dividends (round-6 advice: the old sign fixup and the preallocated
        # result buffer were dead)
        pids = np.mod(hashes.astype(np.int64), self.n_partitions)
        pos = _probe_positions(hashes, self.m_bits, self.k)  # k × n
        base = pids * (self.m_bits // 8)  # byte offset of each key's bitset
        byte = self._cat[base + (pos >> 3)]
        # packbits is MSB-first: bool index b lands in byte b>>3 at bit 7-(b&7)
        bit = (byte >> (7 - (pos & 7)).astype(np.uint8)) & 1
        return bit.all(axis=0).astype(bool)

    def state_bytes(self) -> dict[int, bytes]:
        return {p: b.tobytes() for p, b in self.bitsets.items()}

    @classmethod
    def from_state(cls, state: dict[int, bytes], m_bits: int, k: int):
        o = cls(n_partitions=len(state), m_bits=m_bits, k=k)
        for p, b in state.items():
            o.bitsets[int(p)] = np.frombuffer(b, dtype=np.uint8).copy()
        return o


class CuckooFilter:
    """Bucketized cuckoo filter (4 slots/bucket, 16-bit fingerprints).

    Supports delete — the property blooms lack — so speculative keys from an
    uncommitted wave can be released on abort (SURVEY.md §4.3.2).
    """

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, n_buckets: int = 1 << 14, seed: int = 7):
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.rng = np.random.Generator(np.random.PCG64(seed))
        self.count = 0

    def _fp(self, h: int) -> int:
        fp = (h ^ (h >> 17) ^ (h >> 33)) & 0xFFFF
        return fp if fp != 0 else 1

    def _idx(self, h: int) -> int:
        return (h >> 16) % self.n_buckets

    def _alt(self, i: int, fp: int) -> int:
        return (i ^ (fp * 0x5BD1E995)) % self.n_buckets

    def insert(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._idx(h)
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        i = int(self.rng.choice([i1, i2]))
        for _ in range(self.MAX_KICKS):
            slot = int(self.rng.integers(0, self.SLOTS))
            fp, self.table[i][slot] = int(self.table[i][slot]), fp
            i = self._alt(i, fp)
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False  # table full — caller should trigger a bloom rebuild

    def contains(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._idx(h)
        i2 = self._alt(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized twin of `contains` (round 6 — the scalar fromiter loop
        sat one `mark_seen(..., cuckoo=ck)` call away from the hot probe
        path, inside the same mapInPandas the bloom probe was vectorized
        for). Fingerprint, bucket and alt-bucket are pure integer ops with
        the same arithmetic-shift / floor-mod semantics as the scalar path
        (int64 two's-complement low bits == Python int low bits), then two
        row gathers over the bucket table. Bit-identical by test pin."""
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        h = hashes.astype(np.int64)
        fp = (h ^ (h >> np.int64(17)) ^ (h >> np.int64(33))) & np.int64(0xFFFF)
        fp = np.where(fp == 0, np.int64(1), fp)
        i1 = (h >> np.int64(16)) % self.n_buckets
        i2 = (i1 ^ (fp * np.int64(0x5BD1E995))) % self.n_buckets
        fpc = fp.astype(np.uint16)[:, None]
        return (self.table[i1] == fpc).any(axis=1) | (
            self.table[i2] == fpc
        ).any(axis=1)

    def delete(self, h: int) -> bool:
        fp = self._fp(h)
        i1 = self._idx(h)
        for i in (i1, self._alt(i1, fp)):
            hits = np.where(self.table[i] == fp)[0]
            if len(hits):
                self.table[i][hits[0]] = 0
                self.count -= 1
                return True
        return False


def prefilter_candidates(
    candidates: DataFrame,
    bloom: PartitionedBloom | None,
    cuckoo: CuckooFilter | None,
    hash_col: str = "url_hash",
) -> DataFrame:
    """Tag candidates with `maybe_seen`; False ⇒ definitely new (skip the
    exact anti-join). Filters ship to executors as broadcast state inside a
    mapInPandas closure — bitsets only, never the key sets."""
    if bloom is None and cuckoo is None:
        return candidates.withColumn("maybe_seen", F.lit(True))

    spark = candidates.sparkSession
    bstate = (bloom.state_bytes(), bloom.m_bits, bloom.k) if bloom else None
    ctable = cuckoo.table.copy() if cuckoo else None
    cbuckets = cuckoo.n_buckets if cuckoo else 0
    bc = spark.sparkContext.broadcast((bstate, ctable, cbuckets))
    # StructType.add mutates in place — build a fresh copy for the output
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(candidates.schema.fields) + [T.StructField("maybe_seen", T.BooleanType())]
    )
    names = [f.name for f in candidates.schema.fields]
    hpos = names.index(hash_col)

    def check(batches):
        state, ct, cb = bc.value
        bl = (
            PartitionedBloom.from_state(state[0], state[1], state[2])
            if state
            else None
        )
        ck = None
        if ct is not None:
            ck = CuckooFilter(n_buckets=cb)
            ck.table = ct
        for pdf in batches:
            h = pdf.iloc[:, hpos].to_numpy(np.int64)
            maybe = np.zeros(len(pdf), dtype=bool)
            if bl is not None:
                maybe |= bl.might_contain(h)
            if ck is not None:
                maybe |= ck.contains_many(h)
            yield pdf.assign(maybe_seen=maybe)

    return candidates.mapInPandas(check, schema=out_schema)


def mark_seen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: PartitionedBloom | None = None,
    cuckoo: CuckooFilter | None = None,
    key: str = "cache_key",
) -> DataFrame:
    """Row-preserving seen probe: adds a `_seen` boolean instead of dropping
    rows, so the caller can count candidates/fresh/admitted in ONE aggregate
    action (the anti-join variant forces a separate count per subset).

    `seen` holds unique keys by construction — every wave's delta excludes
    prior keys and is first-occurrence-deduped within the wave — so the left
    join is row-preserving. Tier semantics match dedup_against_seen: a
    candidate flagged definitely-new by the probabilistic tiers skips the
    exact join's shuffle entirely; the join stays the authority.
    """
    probe = seen.select(key).withColumn("_in_seen", F.lit(True))
    tagged = prefilter_candidates(candidates, bloom, cuckoo)
    if bloom is None and cuckoo is None:
        joined = tagged.drop("maybe_seen").join(probe, key, "left")
        return joined.withColumn(
            "_seen", F.coalesce(F.col("_in_seen"), F.lit(False))
        ).drop("_in_seen")
    fresh_fast = (
        tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        .withColumn("_seen", F.lit(False))
    )
    suspects = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = (
        suspects.join(probe, key, "left")
        .withColumn("_seen", F.coalesce(F.col("_in_seen"), F.lit(False)))
        .drop("_in_seen")
    )
    return fresh_fast.unionByName(checked)


def dedup_against_seen(
    candidates: DataFrame,
    seen: DataFrame,
    bloom: PartitionedBloom | None = None,
    cuckoo: CuckooFilter | None = None,
) -> DataFrame:
    """New-URL admission: probabilistic pre-filter, then exact left-anti join
    on cache_key (md5 — the reference's dedup key, job.go:117-130).

    Returns candidates that are NOT in `seen`. Exact regardless of tiers.
    """
    tagged = prefilter_candidates(candidates, bloom, cuckoo)
    fresh_fast = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
    suspects = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
    checked = suspects.join(
        seen.select("cache_key"), "cache_key", "left_anti"
    )
    return fresh_fast.unionByName(checked)
