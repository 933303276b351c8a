"""Stateful streaming windows — the incremental counterpart of the
batch ``windowed_agg`` query.

Ray Data has no event-time watermarks; the brief's custom-operator
ladder applies: (a) batch windows are a groupby (queries.windowed_agg);
(c) INCREMENTAL windows over an unbounded/ordered log need state in
actors.  Shape here:

  * the log is partitioned by ``hash(key) % n_buckets`` — one
    WindowBucketActor per bucket owns every window of its keys (single
    owner → no cross-actor merge);
  * batches are fed in per-bucket timestamp order (the partitioned-log
    ordering assumption — stated, as required, for this operator);
  * a low-watermark = max_ts − allowed_lateness closes windows: late
    events inside the lateness bound still count, later ones are
    recorded in a ``late_dropped`` metric (never silently lost);
  * ``flush()`` emits closed windows; ``finalize()`` drains the rest.

The equivalence test feeds a shuffled-then-bucket-sorted event log and
asserts the emitted windows equal the batch groupby result exactly.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class WindowBucketActor:
    """Tumbling event-time windows for one key bucket."""

    def __init__(self, window_us: int, allowed_lateness_us: int = 0):
        self.window_us = window_us
        self.lateness = allowed_lateness_us
        self.open: dict[tuple, dict] = {}  # (key, window_start) → {n, sum}
        self.max_ts = -(1 << 62)
        self.late_dropped = 0
        self.closed: list[dict] = []

    def feed(self, keys: list, ts_us: np.ndarray, values: np.ndarray) -> None:
        watermark = self.max_ts - self.lateness
        for k, t, v in zip(keys, ts_us, values):
            t = int(t)
            ws = t - t % self.window_us
            if t < watermark and (k, ws) not in self.open:
                self.late_dropped += 1  # beyond lateness AND window gone
                continue
            slot = self.open.setdefault((k, ws), {"n": 0, "sum": 0})
            slot["n"] += 1
            slot["sum"] += int(v)
            self.max_ts = max(self.max_ts, t)
        self._close_ready()

    def _close_ready(self) -> None:
        watermark = self.max_ts - self.lateness
        for (k, ws) in [kw for kw in self.open if kw[1] + self.window_us <= watermark]:
            slot = self.open.pop((k, ws))
            self.closed.append(
                {"key": k, "window_start_us": ws, "n": slot["n"], "sum": slot["sum"]}
            )

    def flush(self) -> list[dict]:
        out, self.closed = self.closed, []
        return out

    def finalize(self) -> list[dict]:
        for (k, ws), slot in sorted(self.open.items(), key=lambda kv: (str(kv[0][0]), kv[0][1])):
            self.closed.append(
                {"key": k, "window_start_us": ws, "n": slot["n"], "sum": slot["sum"]}
            )
        self.open.clear()
        out, self.closed = self.closed, []
        return out

    def stats(self) -> dict:
        return {"late_dropped": self.late_dropped, "open_windows": len(self.open)}


class StreamingWindows:
    """Driver handle: route event batches to bucket actors (stable key
    hash), collect closed windows."""

    def __init__(self, n_buckets: int = 4, window_us: int = 3_600_000_000, allowed_lateness_us: int = 0):
        self.n = n_buckets
        self.actors = [
            WindowBucketActor.options(num_cpus=0).remote(window_us, allowed_lateness_us)
            for _ in range(n_buckets)
        ]

    def _bucket(self, keys) -> np.ndarray:
        import pandas as pd

        h = pd.util.hash_pandas_object(pd.Series(keys, dtype=object), index=False).to_numpy()
        return (h % self.n).astype(np.int64)

    def feed_table(self, t: pa.Table, key_col: str, ts_col: str, value_col: str) -> None:
        keys = t[key_col].to_pylist()
        ts = t[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        vals = t[value_col].to_numpy(zero_copy_only=False)
        b = self._bucket(keys)
        futs = []
        for s in range(self.n):
            sel = np.where(b == s)[0]
            if len(sel):
                # per-bucket ts order (the partitioned-log assumption)
                sel = sel[np.argsort(ts[sel], kind="stable")]
                futs.append(
                    self.actors[s].feed.remote(
                        [keys[i] for i in sel], ts[sel], vals[sel]
                    )
                )
        ray.get(futs)

    def finalize(self) -> pa.Table:
        rows = [r for part in ray.get([a.finalize.remote() for a in self.actors]) for r in part]
        rows += [r for part in ray.get([a.flush.remote() for a in self.actors]) for r in part]
        return pa.Table.from_pylist(rows) if rows else pa.table(
            {"key": pa.array([], type=pa.string()),
             "window_start_us": pa.array([], type=pa.int64()),
             "n": pa.array([], type=pa.int64()),
             "sum": pa.array([], type=pa.int64())}
        )

    def stats(self) -> dict:
        per = ray.get([a.stats.remote() for a in self.actors])
        return {
            "late_dropped": sum(p["late_dropped"] for p in per),
            "open_windows": sum(p["open_windows"] for p in per),
        }
