"""Hot-host salted frontier partitioning."""

import pyarrow as pa

from crawler_ray.state.frontier import partition_frontier, partition_sizes, write_partitioned


def _frontier(hosts):
    return pa.table(
        {
            "url": [f"http://{h}/p{i}" for i, h in enumerate(hosts)],
            "host": hosts,
        }
    )


def test_cold_hosts_stay_together():
    hosts = [f"h{i % 10}.com" for i in range(200)]
    t = partition_frontier(_frontier(hosts), n_partitions=8, hot_threshold=1024)
    # each host maps to exactly one partition
    seen = {}
    for h, p in zip(t.column("host").to_pylist(), t.column("partition").to_pylist()):
        assert seen.setdefault(h, p) == p


def test_hot_host_salted_evenly():
    hosts = ["hot.com"] * 5000 + [f"cold{i}.com" for i in range(100)]
    t = partition_frontier(_frontier(hosts), n_partitions=16, hot_threshold=1024)
    hot_parts = {
        p
        for h, p in zip(t.column("host").to_pylist(), t.column("partition").to_pylist())
        if h == "hot.com"
    }
    # 5000/1024 → 5 salt sub-queues on distinct partitions
    assert len(hot_parts) == 5
    sizes = partition_sizes(t)
    # no partition holds more than ~hot_threshold of the hot host + colds
    assert max(sizes.values()) <= 1024 + 100


def test_partitioned_write(tmp_path):
    hosts = ["a.com"] * 5 + ["b.com"] * 5
    t = partition_frontier(_frontier(hosts), n_partitions=4)
    paths = write_partitioned(t, str(tmp_path / "frontier"))
    import pyarrow.parquet as pq

    total = sum(pq.read_metadata(p).num_rows for p in paths)
    assert total == 10
    assert all(p.endswith(".parquet") for p in paths)
