"""Distributed connected components over a pair Dataset.

The dedup flow at scale is: candidate pairs (LSH / simhash / ngram
regimes) → verify → CONNECTED COMPONENTS → keep one representative per
component.  The driver-side union-find in ``dedup.connected_components``
is fine when the verified-pair set is tiny; this module is the scale
path: components over pair sets too large to gather (10^9+ edges), as
sharded-actor min-label propagation (the Pregel pattern, same idiom as
the crawl's seen shards):

- Each ``CCShard`` owns the nodes hashing to it: their adjacency (CSR
  over int64 arrays, built once from the pair Dataset) and their
  current component label (initially the node id).
- A round is delta-propagation: every node whose label CHANGED last
  round proposes its label to its neighbours.  Proposals travel
  shard→shard through the object store (``ray.put`` inside the source
  shard, refs routed by the driver, ``ray.get`` inside the dest shard)
  — the driver only ever sees per-shard changed-counts, never labels.
- Labels only decrease, so the fixpoint (no shard reports a change) is
  exact min-reachable-id per node; rounds = graph diameter, which for
  near-dup components is tiny.  (For adversarially long chains, the
  large-star/small-star doubling trick of Kiveris et al. would cut
  rounds to O(log n); plain delta min-label is the right default for
  dedup workloads.)

Every array op inside the shards is vectorized numpy (searchsorted CSR
lookups, np.minimum.reduceat per-destination mins); nothing is
per-edge Python.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

# odd 64-bit mixer (same family as dedup's bucket mixing) so sequential
# ids spread across shards instead of striping
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _owner(node: np.ndarray, n_shards: int) -> np.ndarray:
    return ((node.astype(np.uint64) * _MIX) >> np.uint64(33)).astype(np.int64) % n_shards


class _CCShardImpl:
    def __init__(self, sid: int, n_shards: int):
        self.sid = sid
        self.n_shards = n_shards
        self._src_parts: list[np.ndarray] = []
        self._dst_parts: list[np.ndarray] = []
        self.nodes: np.ndarray | None = None

    # ---- build -------------------------------------------------------
    def add_edges(self, tbl: pa.Table) -> int:
        """Directed edges (u, v) with owner(u) == sid; symmetrization is
        the caller's job (each undirected pair arrives here twice, once
        per direction, each at its source's owner)."""
        self._src_parts.append(tbl["u"].to_numpy().astype(np.int64))
        self._dst_parts.append(tbl["v"].to_numpy().astype(np.int64))
        return tbl.num_rows

    def finalize(self) -> int:
        src = (
            np.concatenate(self._src_parts) if self._src_parts else np.zeros(0, np.int64)
        )
        dst = (
            np.concatenate(self._dst_parts) if self._dst_parts else np.zeros(0, np.int64)
        )
        self._src_parts = self._dst_parts = []
        order = np.argsort(src, kind="stable")
        src, dst = src[order], dst[order]
        self.nodes, starts = np.unique(src, return_index=True)
        self.indptr = np.append(starts, len(src))
        self.adj = dst
        self.labels = self.nodes.copy()  # min-label starts at own id
        self.changed = np.ones(len(self.nodes), dtype=bool)  # round 0: all propose
        return len(self.nodes)

    # ---- one round ---------------------------------------------------
    def propose(self):
        """Changed nodes push their label to every neighbour; returns
        {dest_sid: ObjectRef[(node,lbl) table]} routed by the driver."""
        import ray

        idx = np.nonzero(self.changed)[0]
        self.changed[:] = False
        if not len(idx):
            return {}
        counts = self.indptr[idx + 1] - self.indptr[idx]
        # gather neighbour slices of the changed nodes (vectorized
        # ragged-take: repeat each slice start minus its running offset,
        # add a flat arange)
        total = int(counts.sum())
        offs = np.zeros(len(counts), dtype=np.int64)
        np.cumsum(counts[:-1], out=offs[1:])
        take = np.repeat(self.indptr[idx] - offs, counts) + np.arange(total)
        nbr = self.adj[take]
        lbl = np.repeat(self.labels[idx], counts)
        dest = _owner(nbr, self.n_shards)
        order = np.argsort(dest, kind="stable")
        nbr, lbl, dest = nbr[order], lbl[order], dest[order]
        uniq, starts = np.unique(dest, return_index=True)
        bounds = np.append(starts, len(dest))
        out = {}
        for k, d in enumerate(uniq):
            tbl = pa.table(
                {
                    "node": pa.array(nbr[bounds[k] : bounds[k + 1]]),
                    "lbl": pa.array(lbl[bounds[k] : bounds[k + 1]]),
                }
            )
            out[int(d)] = ray.put(tbl)
        return out

    def apply(self, refs: list) -> int:
        """Min-merge incoming proposals into owned labels; returns the
        number of owned nodes whose label changed this round."""
        import ray

        if not refs:
            return 0
        tbls = ray.get(refs)
        node = np.concatenate([t["node"].to_numpy() for t in tbls])
        lbl = np.concatenate([t["lbl"].to_numpy() for t in tbls])
        order = np.argsort(node, kind="stable")
        node, lbl = node[order], lbl[order]
        uniq, starts = np.unique(node, return_index=True)
        mins = np.minimum.reduceat(lbl, starts)
        pos = np.searchsorted(self.nodes, uniq)
        # every proposed node is owned here by construction
        better = mins < self.labels[pos]
        self.labels[pos[better]] = mins[better]
        self.changed[pos[better]] = True
        return int(better.sum())

    def result(self):
        import ray

        return ray.put(
            pa.table(
                {
                    "doc_id": pa.array(self.nodes),
                    "component": pa.array(self.labels),
                }
            )
        )


def cc_label_propagation(
    pairs,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    n_shards: int = 8,
    max_rounds: int = 200,
):
    """Connected components of an undirected pair Dataset → Dataset of
    (doc_id, component) where component is the min node id reachable.
    Nodes are the ids appearing in pairs (singletons are implicitly
    their own component and are not emitted — semi-join the corpus
    against this table to resolve them)."""
    import ray
    import ray.data as rd

    CCShard = ray.remote(_CCShardImpl)
    shards = [CCShard.remote(s, n_shards) for s in range(n_shards)]

    def route(t: pa.Table) -> pa.Table:
        a = t[col_a].to_numpy().astype(np.int64)
        b = t[col_b].to_numpy().astype(np.int64)
        u = np.concatenate([a, b])  # symmetrize: each pair, both directions
        v = np.concatenate([b, a])
        dest = _owner(u, n_shards)
        order = np.argsort(dest, kind="stable")
        u, v, dest = u[order], v[order], dest[order]
        uniq, starts = np.unique(dest, return_index=True)
        bounds = np.append(starts, len(dest))
        futs = []
        for k, d in enumerate(uniq):
            futs.append(
                shards[int(d)].add_edges.remote(
                    pa.table(
                        {
                            "u": pa.array(u[bounds[k] : bounds[k + 1]]),
                            "v": pa.array(v[bounds[k] : bounds[k + 1]]),
                        }
                    )
                )
            )
        ray.get(futs)  # backpressure: don't let offers pile up unbounded
        return pa.table({"n": pa.array([t.num_rows])})

    # edge routing runs inside the Dataset scan (worker→shard direct);
    # the driver never holds the pair set
    pairs.map_batches(route, batch_format="pyarrow").materialize()
    ray.get([s.finalize.remote() for s in shards])

    for _ in range(max_rounds):
        proposals = ray.get([s.propose.remote() for s in shards])
        inbox: list[list] = [[] for _ in range(n_shards)]
        for p in proposals:
            for d, ref in p.items():
                inbox[d].append(ref)
        changed = sum(ray.get([s.apply.remote(inbox[i]) for i, s in enumerate(shards)]))
        if changed == 0:
            break
    else:
        raise RuntimeError(f"cc did not converge in {max_rounds} rounds")

    return rd.from_arrow_refs(ray.get([s.result.remote() for s in shards]))
