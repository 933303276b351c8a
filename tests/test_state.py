"""URL-seen filters (bloom + cuckoo) incl. exact snapshot/restore, seen
shard routing, and politeness clock spacing."""

import time

import numpy as np

from crawler_ray.state.bloom import BloomFilter, CuckooFilter


def test_bloom_basics_and_snapshot():
    bf = BloomFilter(capacity=10_000, fp_rate=1e-4)
    urls = [f"http://h{i % 7}.com/p{i}" for i in range(5000)]
    for u in urls:
        assert bf.add(u)  # all new
    assert all(u in bf for u in urls)
    assert not bf.add(urls[0])  # duplicate
    # false-positive rate sanity
    fps = sum(1 for i in range(10_000) if f"http://other/{i}" in bf)
    assert fps < 20
    # snapshot → restore is byte-exact
    snap = bf.snapshot()
    bf2 = BloomFilter.restore(snap)
    assert np.array_equal(bf.bits, bf2.bits) and bf2.count == bf.count
    assert all(u in bf2 for u in urls)


def test_cuckoo_add_delete_snapshot():
    cf = CuckooFilter(capacity=5000)
    urls = [f"http://h/{i}" for i in range(3000)]
    for u in urls:
        assert cf.add(u)
    assert all(u in cf for u in urls)
    assert not cf.add(urls[5])  # already present
    # delete (the capability blooms lack)
    assert cf.delete(urls[5])
    assert urls[5] not in cf
    snap = cf.snapshot()
    cf2 = CuckooFilter.restore(snap)
    assert np.array_equal(cf.table, cf2.table)
    assert urls[6] in cf2 and urls[5] not in cf2


def test_seen_shards_route_and_restore(ray_session):
    from crawler_ray.stages.seen import SeenSet

    seen = SeenSet(n_shards=3, exact_audit=True)
    urls = [f"http://h{i % 5}.com/{i}" for i in range(200)]
    new = seen.test_and_set(urls)
    assert new.all()
    again = seen.test_and_set(urls)
    assert not again.any()
    assert seen.size() == 200
    snaps = seen.snapshot()
    seen2 = SeenSet(n_shards=3, exact_audit=True)
    seen2.restore(snaps)
    assert seen2.members() == set(urls)
    assert not seen2.test_and_set(urls[:10]).any()
    # cuckoo-backed shards work the same
    seen3 = SeenSet(n_shards=2, kind="cuckoo", exact_audit=False)
    assert seen3.test_and_set(urls).all()
    assert not seen3.test_and_set(urls).any()


def test_politeness_clock_spacing(ray_session):
    from crawler_ray.stages.fetch import PolitenessClock

    clock = PolitenessClock.remote(interval_ms=50)
    import ray

    t0 = ray.get(clock.reserve.remote("host.a", 3))  # books 3 slots
    t1 = ray.get(clock.reserve.remote("host.a", 1))  # must wait 150ms
    t2 = ray.get(clock.reserve.remote("host.b", 1))  # other host: now
    assert t1 - t0 >= 0.149
    assert t2 - t0 < 0.05


def test_seen_filter_stage_in_dataset_pipeline(ray_session):
    """make_seen_filter_stage: the map_batches form of the sharded
    test-and-set — a links Dataset keeps only first-seen URLs."""
    import ray.data as rd

    from crawler_ray.stages.seen import SeenSet, make_seen_filter_stage

    seen = SeenSet(n_shards=2)
    seen.test_and_set(["http://h/0", "http://h/1"])  # pre-seen
    links = rd.from_items(
        [{"url": f"http://h/{i}"} for i in [0, 1, 2, 3, 2]]  # dup 2 across rows
    )
    out = links.map_batches(
        make_seen_filter_stage(seen), batch_format="pyarrow", batch_size=2
    ).to_pandas()
    got = sorted(out["url"])
    # 0,1 filtered (pre-seen); 2 kept once (test-and-set); 3 kept
    assert got == ["http://h/2", "http://h/3"]


def test_bloom_batch_add_matches_scalar():
    from crawler_ray.state.bloom import BloomFilter, bloom_add_batch

    bf1, bf2 = BloomFilter(10_000), BloomFilter(10_000)
    urls = [f"http://h/{i}" for i in range(2000)] + ["http://h/5", "http://h/5"]
    scalar = np.array([bf1.add(u) for u in urls])
    batch = bloom_add_batch(bf2, urls)
    assert np.array_equal(scalar, batch)
    assert np.array_equal(bf1.bits, bf2.bits)
    # second batch: everything seen
    assert not bloom_add_batch(bf2, urls[:100]).any()


def test_neardup_snapshot_wire_version_refused(ray_session, tmp_path):
    """A near-dup snapshot written under a DIFFERENT gram-hash family
    must be refused at restore, not silently compared (mixed families
    report near-zero Jaccard and miss duplicates)."""
    import pytest
    import ray

    from crawler_ray.functions import shingles
    from crawler_ray.stages.dedup import NearDupShardActor, NearDupShards

    # dict-form snapshot (NearDupShards.snapshot/restore path)
    nd = NearDupShards(n_shards=2, threshold=0.9)
    nd.process([("u1", shingles.shingle_hash_set("a b c d e f g", 4),
                 shingles.lsh_band_keys(shingles.minhash_signature("a b c d e f g"), 16))])
    snaps = nd.snapshot()
    assert all(s["wire"] == shingles.SHINGLE_WIRE_VERSION for s in snaps)
    stale = [dict(s, wire=1) for s in snaps]
    nd2 = NearDupShards(n_shards=2, threshold=0.9)
    with pytest.raises(Exception, match="wire format"):
        nd2.restore(stale)

    # npz-form snapshot (snapshot_to/restore_from path)
    a = NearDupShardActor.options(num_cpus=0).remote(0, 1, 0.9)
    p = str(tmp_path / "shard.npz")
    ray.get(a.snapshot_to.remote(p))
    import numpy as np

    z = dict(np.load(p).items())
    z["wire"] = np.array([1], dtype=np.int64)  # forge the old family
    with open(p, "wb") as f:
        np.savez(f, **z)
    with pytest.raises(Exception, match="wire format"):
        ray.get(a.restore_from.remote(p))
    # current-version round-trip still works
    ray.get(a.snapshot_to.remote(p))
    ray.get(a.restore_from.remote(p))


def test_merge_reshard_scales_live_filter_capacity(ray_session, tmp_path):
    """ADVICE r4: filter-only restore at FEWER shards (merges) must
    scale the fresh live filter's capacity by the interval-overlap
    factor — the new shard owns a hash interval ~n_old/n_new wider
    than the per-shard capacity it was constructed for, and the base
    layers only cover checkpointed members."""
    from crawler_ray.stages.seen import SeenSet

    cap = 1_000
    old = SeenSet(n_shards=8, capacity_per_shard=cap, exact_audit=False)
    urls = [f"http://h{i % 7}.com/p/{i}" for i in range(500)]
    assert old.test_and_set(urls).all()
    names = old.snapshot_to(str(tmp_path))

    merged = SeenSet(n_shards=2, capacity_per_shard=cap, exact_audit=False)
    merged.restore_from(str(tmp_path), names)
    # no false negatives across the merge
    assert not merged.test_and_set(urls).any()
    # each merged shard's LIVE filter was re-sized ×ceil(8/2)=4
    for snap in merged.snapshot():
        assert snap["filter"]["capacity"] >= cap * 4, snap["filter"]["capacity"]

    # splits (n_new > n_old) keep the constructed capacity — no blowup
    split = SeenSet(n_shards=16, capacity_per_shard=cap, exact_audit=False)
    split.restore_from(str(tmp_path), names)
    assert not split.test_and_set(urls).any()
    for snap in split.snapshot():
        assert snap["filter"]["capacity"] == cap
