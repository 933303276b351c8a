"""Per-round checkpointing with lineage + metrics, and exact resume.

The reference dumps full EDN state once at the END of a crawl
(main.clj:40-85) and never implements resume; the north_rule requires
per-partition checkpoints such that a killed job resumes exactly.

Layout under ``root/``:

    round_00042/
        corpus/part-*.parquet     (this round's fetched docs + spans)
        frontier/part-*.parquet   (frontier AFTER the round)
        manifest.json             (lineage: round, prior round, counters,
                                   metrics, row counts, snapshot paths)
        seen_snapshot.pkl         (every snapshot_every rounds)
        neardup_snapshot.pkl      (        ″        )

A round directory is published ATOMICALLY by renaming ``.tmp`` →
final, so a crash mid-write can never yield a half-readable round;
``latest_round`` only sees published manifests.  Resume = newest round
whose manifest exists AND whose nearest ≤ snapshot round has filter
snapshots; rounds after that snapshot are replayed from their frontier
tables (the corpus parquet of later rounds is simply overwritten —
idempotent because round output is a pure function of frontier+state).
"""
from __future__ import annotations

import json
import os
import pickle

import pyarrow as pa
import pyarrow.parquet as pq
import ray


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round_{rnd:05d}")

    def begin_round(self, rnd: int) -> str:
        """Create (wiping any stale leftover) the round's .tmp staging
        dir and return it — fetch workers write their corpus part files
        straight into ``<tmp>/corpus/`` so the driver never holds span
        data; ``finish_round`` publishes atomically."""
        tmp = self._round_dir(rnd) + ".tmp"
        if os.path.exists(tmp):
            import shutil

            shutil.rmtree(tmp)
        os.makedirs(os.path.join(tmp, "corpus"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "frontier"), exist_ok=True)
        return tmp

    def finish_round(
        self,
        rnd: int,
        frontier: pa.Table | None,
        metrics: dict,
        step: int,
        next_seq: int,
        seen=None,
        neardup=None,
        corpus_rows: int | None = None,
        frontier_rows: int | None = None,
        cookies: dict | None = None,
    ) -> str:
        """Write frontier/manifest/snapshots into the staged tmp dir
        (corpus parts already written by the workers) and publish.

        ``frontier=None`` means the seen shards already wrote their own
        ``frontier/part-*.parquet`` files (the scale path — the driver
        never holds frontier rows); pass ``frontier_rows`` for the
        manifest then."""
        final = self._round_dir(rnd)
        tmp = final + ".tmp"
        if frontier is not None:
            pq.write_table(frontier, os.path.join(tmp, "frontier", "part-00000.parquet"))
            frontier_rows = frontier.num_rows
        snap_paths = {}
        # shard-side snapshot writes (each actor writes its own file to
        # shared storage in parallel): the list-through-the-driver form
        # cost GBs of driver heap at 10^5-leaf near-dup indexes
        if seen is not None:
            snap_paths["seen"] = seen.snapshot_to(tmp)
        if neardup is not None:
            snap_paths["neardup"] = neardup.snapshot_to(tmp)
        manifest = {
            "round": rnd,
            "prior_round": rnd - 1 if rnd > 0 else None,
            "step": step,
            "next_seq": next_seq,
            "metrics": metrics,
            "corpus_rows": corpus_rows,
            "frontier_rows": frontier_rows,
            "snapshots": snap_paths,
            # the shared cookie jar (host → [value, wave]) is state the
            # round's fetch outcomes depend on — tiny (one entry per
            # logged-in host), so it rides in every manifest
            "cookies": cookies or {},
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        if os.path.exists(final):  # overwrite on replay-after-resume
            import shutil

            shutil.rmtree(final)
        os.replace(tmp, final)  # atomic publish
        return final

    def write_round(
        self,
        rnd: int,
        corpus: pa.Table,
        frontier: pa.Table,
        metrics: dict,
        step: int,
        next_seq: int,
        seen=None,
        neardup=None,
    ) -> str:
        """Single-writer convenience (tests / external callers): stage,
        write the corpus as one part, publish."""
        tmp = self.begin_round(rnd)
        pq.write_table(corpus, os.path.join(tmp, "corpus", "part-00000.parquet"))
        return self.finish_round(
            rnd, frontier, metrics, step, next_seq,
            seen=seen, neardup=neardup, corpus_rows=corpus.num_rows,
        )

    def rounds(self) -> list[int]:
        out = []
        if not os.path.isdir(self.root):
            return out
        for d in os.listdir(self.root):
            if d.startswith("round_") and not d.endswith(".tmp"):
                m = os.path.join(self.root, d, "manifest.json")
                if os.path.exists(m):
                    out.append(int(d.split("_")[1]))
        return sorted(out)

    def latest_round(self) -> int | None:
        rs = self.rounds()
        return rs[-1] if rs else None

    def manifest(self, rnd: int) -> dict:
        with open(os.path.join(self._round_dir(rnd), "manifest.json")) as f:
            return json.load(f)

    def load(self, seen, neardup) -> dict:
        """Restore state for resumption: pick the newest round with a
        filter snapshot ≤ latest round; restore filters there and hand
        back that round's frontier/counters (later rounds replay)."""
        rs = self.rounds()
        snap_round = None
        for r in reversed(rs):
            if self.manifest(r)["snapshots"].get("seen"):
                snap_round = r
                break
        if snap_round is None:
            raise RuntimeError("no snapshot round available to resume from")
        d = self._round_dir(snap_round)
        man = self.manifest(snap_round)
        sv = man["snapshots"]["seen"]
        if isinstance(sv, list):
            seen.restore_from(d, sv)
        else:  # legacy single-file checkpoints
            with open(os.path.join(d, sv), "rb") as f:
                seen.restore(pickle.load(f))
        nv = man["snapshots"].get("neardup")
        if isinstance(nv, list):
            neardup.restore_from(d, nv)
        elif nv:
            with open(os.path.join(d, nv), "rb") as f:
                neardup.restore(pickle.load(f))
        fdir = os.path.join(d, "frontier")
        parts = [
            pq.read_table(os.path.join(fdir, p))
            for p in sorted(os.listdir(fdir))
            if p.endswith(".parquet")
        ]
        frontier = pa.concat_tables(parts, promote_options="default")
        return {
            "round": snap_round,
            "frontier": frontier,
            "step": man["step"],
            "next_seq": man["next_seq"],
            "metrics": man["metrics"],
            "cookies": man.get("cookies", {}),
        }

    def _corpus_paths(self, upto_round: int | None = None) -> list[list[str]]:
        """Per-round lists of corpus part files (shared by the streaming
        and materializing readers)."""
        out = []
        for r in self.rounds():
            if upto_round is not None and r > upto_round:
                break
            d = os.path.join(self._round_dir(r), "corpus")
            out.append(
                [os.path.join(d, p) for p in sorted(os.listdir(d)) if p.endswith(".parquet")]
            )
        return out

    def corpus_dataset(self, upto_round: int | None = None):
        """The accumulated corpus as a STREAMING Ray Data Dataset over
        the per-round parquet part files — the scale-path consumable
        (``corpus_table`` materializes on the driver and is for tests /
        small corpora).  Row order within a read batch is file order;
        use the ``depth``/``discovery_seq`` columns when crawl order
        matters."""
        import ray.data as rd

        paths = [p for rnd in self._corpus_paths(upto_round) for p in rnd]
        if not paths:
            raise FileNotFoundError(
                f"no corpus parquet parts under {self.root} — nothing checkpointed yet"
            )
        return rd.read_parquet(paths)

    def corpus_table(self, upto_round: int | None = None) -> pa.Table:
        tables = []
        for round_paths in self._corpus_paths(upto_round):
            parts = [pq.read_table(p) for p in round_paths]
            if not parts:
                continue
            rt = pa.concat_tables(parts)
            # workers write parts in chunk order, which under politeness
            # host-grouping is NOT crawl-priority order; restore the
            # wave's (depth, discovery_seq) order so every consumer sees
            # rows in crawl order regardless of chunking
            import numpy as np

            order = np.lexsort(
                (
                    rt.column("discovery_seq").to_numpy(),
                    rt.column("depth").to_numpy(),
                )
            )
            if not np.array_equal(order, np.arange(rt.num_rows)):
                rt = rt.take(pa.array(order))
            tables.append(rt)
        return pa.concat_tables(tables) if tables else None


    def export_corpus_partitioned(self, out_dir: str, n_partitions: int = 16) -> list[str]:
        """Export the accumulated corpus as host-partitioned parquet
        (salted for hot hosts) — the consumable documents layout: one
        atomic file per partition so downstream reruns skip finished
        partitions."""
        from .frontier import partition_frontier, write_partitioned

        corpus = self.corpus_table()
        if corpus is None:
            return []
        return write_partitioned(
            partition_frontier(corpus, n_partitions=n_partitions), out_dir
        )
