"""Shared relational building blocks for Ray Data pipelines.

Design rules (SURVEY.md §4, §7):
  * money/quantity aggregates go through exact integer cents
    (``floor(x*100 + 0.5)`` → int64) so distributed summation order
    cannot perturb results vs the DuckDB oracle;
  * every big groupby is preceded by a per-batch partial aggregation
    (combiner) so the shuffle moves one row per key per batch, not one
    row per input row;
  * small sides are broadcast via ``ray.put`` once, never re-shipped
    per batch; large-large joins use ``Dataset.join`` (hash
    partitioned).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def cents(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Exact integer cents: floor(x*100 + 0.5) as int64.

    ``floor`` (not ``round``) so Ray and DuckDB agree on exact .5
    boundaries — Arrow rounds half-to-even, DuckDB half-away."""
    return pc.cast(pc.floor(pc.add(pc.multiply(col, pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())


def make_partial_agg(keys: list[str], sum_cols: list[str], count_name: str = "partial_n"):
    """Per-batch combiner: groupby(keys) within the batch, emitting
    partial sums (``<col>_sum``) + a partial count column.  Cuts the
    global shuffle from O(rows) to O(keys × batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_cols] + [([], "count_all")]
        out = batch.group_by(keys).aggregate(aggs)
        return out.rename_columns(
            [count_name if n == "count_all" else n for n in out.column_names]
        )

    return fn


def final_groupby_sum(ds, keys: list[str], partial_cols: dict[str, str]):
    """Global groupby over partials: Sum each ``partial → alias``."""
    from ray.data.aggregate import Sum

    aggs = [Sum(src, alias_name=dst) for src, dst in partial_cols.items()]
    return ds.groupby(keys if len(keys) > 1 else keys[0]).aggregate(*aggs)


def broadcast_dict(mapping: dict):
    """``ray.put`` a lookup table once; stages resolve the ref lazily
    inside workers (small-side broadcast join, SURVEY.md §2.5)."""
    import ray

    return ray.put(mapping)


def add_prefix_sum(ds, col: str, out_col: str, order_col: str):
    """Distributed EXCLUSIVE prefix sum (scan): ``out_col[i] = Σ col[j]
    for all rows with order_col[j] < order_col[i]`` — the classic
    two-phase scan.  Phase 1 collects one (min order key, block total)
    row per block to the driver (tiny), computes exclusive block
    offsets; phase 2 re-walks the SAME blocks adding within-block
    cumsum + the block's offset.

    ``ds`` is sorted by ``order_col`` first (global order is the scan's
    contract); order_col values must be unique."""
    import numpy as np
    import ray

    ds = ds.sort(order_col).materialize()

    def block_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.int64())})
        return pa.table(
            {
                "k": pa.array([pc.min(t[order_col]).as_py()], type=pa.int64()),
                "s": pa.array([pc.sum(t[col]).as_py() or 0], type=pa.int64()),
            }
        )

    summ = (
        ds.map_batches(block_summary, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("k")
    )
    keys = summ["k"].to_numpy(dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(summ["s"].to_numpy(dtype=np.int64))[:-1]])
    oref = ray.put((keys, offs))

    def add_scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], type=pa.int64()))
        ks, os_ = ray.get(oref)
        mk = pc.min(t[order_col]).as_py()
        i = np.searchsorted(ks, mk)
        # the scan's contract: phase-2 batches start exactly at phase-1
        # block boundaries (same materialized blocks, batch_size=None);
        # a mid-block batch would silently take the NEXT block's offset
        assert i < len(ks) and ks[i] == mk, "prefix-sum block boundaries diverged"
        base = os_[i]
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.cumsum(v) - v + base
        return t.append_column(out_col, pa.array(excl, type=pa.int64()))

    return ds.map_batches(add_scan, batch_format="pyarrow", batch_size=None)


def bucketed_agg(ds, keys: list[str], sum_cols: dict[str, str], n_buckets: int = 32, key_dtypes: dict | None = None):
    """Aggregation for HIGH-CARDINALITY keys: Ray's groupby().aggregate()
    costs ~2 ms of per-group Python overhead, so >10^4 groups is minutes.
    Instead: hash keys into ``n_buckets`` coarse buckets, shuffle once on
    the bucket id, and run one vectorized pandas groupby per bucket.

    ``sum_cols``: {input_col: output_name} summed per key group; a
    ``{"__count__": name}`` entry emits group sizes.  ``key_dtypes``
    overrides the int64 default for non-integer key columns (string
    keys need {"col": "object"} so EMPTY partitions don't emit
    int64-typed blocks into the schema union).  Returns a Dataset with
    ``keys + list(sum_cols.values())`` columns.
    """
    import pandas as pd

    real_sums = {c: o for c, o in sum_cols.items() if c != "__count__"}
    count_name = sum_cols.get("__count__")
    key_dtypes = key_dtypes or {}

    def _typed_empty() -> pd.DataFrame:
        cols = {k: pd.Series([], dtype=key_dtypes.get(k, "int64")) for k in keys}
        for c in real_sums:
            cols[c] = pd.Series([], dtype="int64")
        return pd.DataFrame(cols)

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if df.shape[1] == 0:  # schemaless empty partition from upstream
            df = _typed_empty()
        h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
        df = df.copy()
        df["__bucket"] = (h % n_buckets).astype("int32")
        return df

    def agg_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if "__bucket" in g.columns:
            g = g.drop(columns="__bucket")
        if g.shape[1] == 0:
            g = _typed_empty()
        gb = g.groupby(keys, as_index=False, sort=False)
        if real_sums:
            out = gb[list(real_sums)].sum()
            out = out.rename(columns=real_sums)
            if count_name:
                out[count_name] = gb.size()["size"].to_numpy()
        else:
            out = gb.size().rename(columns={"size": count_name})
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(agg_bucket, batch_format="pandas")
    )
