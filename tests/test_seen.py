"""Seen-set tiers: partitioned bloom (no false negatives), cuckoo overflow
(insert/contains/delete), and exactness of the tiered dedup vs plain anti-join
with the prefilter FORCED on (the engine only engages it at scale)."""

import numpy as np

from crawlspark import seen as SEEN


def test_bloom_no_false_negatives_and_low_fp():
    bloom = SEEN.PartitionedBloom(n_partitions=8, m_bits=1 << 16, k=5)
    rng = np.random.Generator(np.random.PCG64(7))
    keys = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    # distributed-build path needs Spark; use the same probe math directly
    for p in range(8):
        sel = np.mod(keys, 8) == p
        pos = SEEN._probe_positions(keys[sel], bloom.m_bits, bloom.k)
        bits = np.unpackbits(bloom.bitsets[p])
        bits[pos.ravel()] = 1
        bloom.bitsets[p] = np.packbits(bits)
    assert bloom.might_contain(keys).all()  # zero false negatives, always
    probe = rng.integers(-(2**62), 2**62, size=5000, dtype=np.int64)
    fresh = probe[~np.isin(probe, keys)]
    fp = bloom.might_contain(fresh).mean()
    assert fp < 0.05, fp


def test_bloom_distributed_build_matches(spark):
    df = spark.range(0, 2000).selectExpr("xxhash64(cast(id as string)) AS url_hash")
    bloom = SEEN.PartitionedBloom(n_partitions=4, m_bits=1 << 14, k=5)
    bloom.add_from_df(df)
    hashes = np.array([r.url_hash for r in df.collect()], dtype=np.int64)
    assert bloom.might_contain(hashes).all()


def test_cuckoo_filter_semantics():
    ck = SEEN.CuckooFilter(n_buckets=1 << 10)
    keys = list(range(1000, 2000))
    for k in keys:
        assert ck.insert(k)
    assert all(ck.contains(k) for k in keys)
    # deletion — the property blooms lack (releases speculative wave keys)
    for k in keys[:100]:
        assert ck.delete(k)
    assert sum(ck.contains(k) for k in keys[:100]) <= 5  # fp collisions only
    assert all(ck.contains(k) for k in keys[100:])
    fp = sum(ck.contains(k) for k in range(50_000, 55_000)) / 5000
    assert fp < 0.05, fp


def test_tiered_dedup_exact_vs_plain_anti_join(spark):
    cand = spark.range(0, 3000).selectExpr(
        "xxhash64(cast(id as string)) AS url_hash",
        "md5(cast(id as string)) AS cache_key",
        "id",
    )
    seen = spark.range(0, 3000, 3).selectExpr(
        "xxhash64(cast(id as string)) AS url_hash",
        "md5(cast(id as string)) AS cache_key",
    )
    bloom = SEEN.PartitionedBloom(n_partitions=4, m_bits=1 << 16, k=5)
    bloom.add_from_df(seen)
    cuckoo = SEEN.CuckooFilter(1 << 12)
    tiered = SEEN.dedup_against_seen(cand, seen, bloom, cuckoo)
    plain = cand.join(seen.select("cache_key"), "cache_key", "left_anti")
    got = sorted(r.id for r in tiered.collect())
    want = sorted(r.id for r in plain.collect())
    assert got == want  # tiers can never change the answer
    assert len(got) == 2000


def test_cuckoo_contains_many_matches_scalar():
    # round 6: contains_many is a numpy batch kernel — pin it bit-identical
    # to the scalar contains() over inserted, absent, and NEGATIVE hashes
    # (int64 arithmetic-shift / floor-mod semantics must match Python ints)
    import numpy as np

    ck = SEEN.CuckooFilter(1 << 10)
    rng = np.random.Generator(np.random.PCG64(99))
    inserted = rng.integers(-(2**62), 2**62, size=500, dtype=np.int64)
    for h in inserted:
        ck.insert(int(h))
    absent = rng.integers(-(2**62), 2**62, size=500, dtype=np.int64)
    probe = np.concatenate([inserted, absent])
    got = ck.contains_many(probe)
    want = np.array([ck.contains(int(h)) for h in probe], dtype=bool)
    assert (got == want).all()
    assert got[: len(inserted)].all()  # no false negatives for inserted keys
    assert ck.contains_many(np.array([], dtype=np.int64)).shape == (0,)


def test_bloom_prefilter_broadcast_envelope(spark):
    # round 6 (r5 verdict #4): the broadcast probe auto-disables once the
    # tier exceeds the configured executor-broadcastable envelope — the
    # exact anti-join authority is unaffected, only the prefilter gates off
    from crawlspark.engine import CrawlConfig, CrawlEngine
    from crawlspark import synth

    world = synth.make_world(n_hosts=2, total_pages=20)
    small = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        config=CrawlConfig(use_bloom=True, bloom_partitions=4, bloom_bits=1 << 16),
    )
    assert small._bloom_broadcastable()  # 4 × 8 KB ≪ 256 MB default

    big = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        config=CrawlConfig(
            use_bloom=True, bloom_partitions=4, bloom_bits=1 << 16,
            bloom_broadcast_max_mb=0,
        ),
    )
    assert not big._bloom_broadcastable()  # 0 MB cap → prefilter must gate off

    off = CrawlEngine(
        spark,
        pages=synth.pages_df(spark, world),
        robots=synth.robots_df(spark, world),
        budgets=synth.politeness_df(spark, world),
        config=CrawlConfig(use_bloom=False),
    )
    assert not off._bloom_broadcastable()
