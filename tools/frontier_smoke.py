"""Scale smoke: crawl-attributable driver RSS vs frontier size.

Runs the headline BSP crawl (bench topology, keep_trace=False) at a
given page count and reports the driver RSS HIGH-WATER MARK reached
DURING the crawl, relative to RSS after setup (graph build + ray.put +
worker pool) — i.e. the crawl-attributable driver memory.  With the
round-3 shard-resident frontier the delta must stay flat as the graph
(and so the frontier) grows; round 2's driver-held frontier grew
linearly.

    python tools/frontier_smoke.py [n_pages] [num_cpus] [wave_size]

``wave_size`` (default 8000) bounds the per-round wave — the 10^10
posture, where the only driver-resident per-round data (wave meta,
commit key arrays) is wave-bounded; pass 0 for unbounded BFS levels
(driver transients then scale with the level width, by design).

Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


class PeakSampler(threading.Thread):
    def __init__(self, interval=0.05):
        super().__init__(daemon=True)
        self.peak = 0.0
        self.stop = False
        self.interval = interval

    def run(self):
        while not self.stop:
            self.peak = max(self.peak, rss_mb())
            time.sleep(self.interval)


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 120_000
    num_cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    wave_size = int(sys.argv[3]) if len(sys.argv) > 3 else 8000

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from crawler_ray import synth
    from crawler_ray.pipelines.crawl import CrawlConfig, crawl, make_workers

    n_hosts = max(8, n_pages // 600)
    zipf = 0.35
    norm = sum(1 / (h + 1) ** zipf for h in range(n_hosts))
    pages = synth.generate_site_graph(
        num_hosts=n_hosts, base_pages=max(8, int(n_pages / norm)), seed=42,
        zipf=zipf, leaf_text_words=700, leaves_per_index=40, flat_index_hub=True,
    )
    seeds = synth.seeds_for(pages)
    cfg = CrawlConfig(
        wave_size=wave_size or None, n_seen_shards=8, exact_audit=False, n_neardup_shards=8,
        fetch_concurrency=max(1, num_cpus - min(4, num_cpus // 2)),
        keep_trace=False,
    )
    graph_ref = ray.put(pages)
    workers = make_workers(graph_ref, cfg)
    import pyarrow as pa

    from crawler_ray.pipelines.crawl import _frontier_schema

    probe = pa.Table.from_pylist(
        [{"url": seeds[0], "host": "", "depth": 0, "discovery_seq": 0,
          "src_url": "", "src_xpath": []}],
        schema=_frontier_schema(),
    )
    ray.get([w.process.remote(probe) for w in workers])

    import gc

    gc.collect()
    rss_setup = rss_mb()
    sampler = PeakSampler()
    sampler.start()
    t0 = time.time()
    res = crawl(pages, seeds, cfg, graph_ref=graph_ref, workers=workers)
    wall = time.time() - t0
    sampler.stop = True
    sampler.join()
    print(json.dumps({
        "wave_size": wave_size,
        "pages_in_graph": pages.num_rows,
        "urls_fetched": res.metrics["fetched"],
        "links_deduped": res.metrics["links_new"],
        "rounds": res.metrics["rounds"],
        "urls_per_sec": round(res.metrics["fetched"] / wall, 1),
        "wall_sec": round(wall, 2),
        "rss_setup_mb": round(rss_setup, 1),
        "rss_peak_crawl_mb": round(max(sampler.peak, rss_setup), 1),
        "crawl_rss_delta_mb": round(max(sampler.peak - rss_setup, 0.0), 1),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
