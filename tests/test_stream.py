"""Streaming windows (stateful actor-per-bucket) vs the batch groupby,
plus out-of-order/lateness semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from crawler_ray.stages.stream import StreamingWindows

SF = "/root/testdata/sf0.001"
H_US = 3_600_000_000


def test_streaming_equals_batch_windows(ray_session):
    t = pq.read_table(f"{SF}/events.parquet", columns=["event_type", "ts", "value"])
    df = t.to_pandas().sort_values("ts").reset_index(drop=True)
    df["v_c"] = np.floor(df["value"] * 100 + 0.5).astype("int64")
    src = pa.Table.from_pandas(df[["event_type", "ts", "v_c"]], preserve_index=False)

    sw = StreamingWindows(n_buckets=3, window_us=H_US, allowed_lateness_us=0)
    chunk = src.num_rows // 5 + 1
    for o in range(0, src.num_rows, chunk):  # ordered feed, 5 batches
        sw.feed_table(src.slice(o, chunk), "event_type", "ts", "v_c")
    got = sw.finalize().to_pandas()
    assert sw.stats()["late_dropped"] == 0

    df["ws"] = (df["ts"].astype("int64") // H_US) * H_US
    want = (
        df.groupby(["event_type", "ws"], as_index=False)
        .agg(n=("v_c", "size"), sum=("v_c", "sum"))
        .rename(columns={"event_type": "key", "ws": "window_start_us"})
    )
    g = got.sort_values(["key", "window_start_us"]).reset_index(drop=True)
    w = want.sort_values(["key", "window_start_us"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["key"] == w["key"]).all()
    assert (g["n"].to_numpy() == w["n"].to_numpy()).all()
    assert (g["sum"].to_numpy() == w["sum"].to_numpy()).all()


def test_lateness_bound(ray_session):
    sw = StreamingWindows(n_buckets=1, window_us=100, allowed_lateness_us=50)
    def feed(rows):
        t = pa.table(
            {
                "k": [r[0] for r in rows],
                "ts": pa.array(
                    np.array([r[1] for r in rows], dtype="int64"), type=pa.timestamp("us")
                ),
                "v": pa.array([r[2] for r in rows], type=pa.int64()),
            }
        )
        sw.feed_table(t, "k", "ts", "v")

    feed([("a", 10, 1), ("a", 250, 1)])   # window [0,100) then [200,300)
    feed([("a", 205, 1)])                 # 45µs late (≤50 allowed): counted
    feed([("a", 400, 1)])                 # advances watermark to 350
    feed([("a", 20, 1)])                  # 380µs late: dropped
    out = sw.finalize().to_pandas().set_index("window_start_us")
    assert sw.stats()["late_dropped"] == 1
    assert out.loc[0, "n"] == 1
    assert out.loc[200, "n"] == 2   # includes the late-but-allowed event
    assert out.loc[400, "n"] == 1
