"""Execution drivers — the reference's ``execute.clj`` + main.clj modes.

  * ``execute_model`` — fold over the PLANNED actions (sorted by
    (length, −yield), execute.clj:10-17 / main.clj:206-216), running
    one crawl-model replay per action and subtracting the spent budget
    (main.clj:260-280); stops when the budget is exhausted
    (execute.clj:50-58 budget-stop?).
  * ``structure_driven_leaf_fn`` — the --structure-driven mode's
    injected leaf predicate: structural similarity to a downloaded
    example leaf (structure_driven.clj:14-16).
  * ``discussion_forum_stop`` — the --discussion-forum stop?: observed
    leaves ≥ num-leaves (discussion_forum.clj:48-71).
"""
from __future__ import annotations

import pyarrow as pa

from ..functions.similarity import structural_similarity
from .model import remove_pagination_from_actions
from .replay import ReplayResult, replay_sequential


def plan(model: dict) -> list[dict]:
    """Planned action order: (len(action_seq), −yield)."""
    return sorted(
        model["actions"], key=lambda a: (len(a["action_seq"]), -a.get("yield", 0.0))
    )


def execute_model(
    pages: pa.Table,
    seeds: list[str],
    model: dict,
    budget: int = 1000,
    fix: bool = True,
) -> ReplayResult:
    """main.clj:198-280: fix-model → plan → fold with budget
    subtraction.  Each planned action runs as its own single-action
    replay (the reference's per-action crawl-model invocations)."""
    if fix:
        model = remove_pagination_from_actions(model)
    merged = ReplayResult()
    remaining = budget
    step_base = 0
    for action in plan(model):
        if remaining <= 0:
            break
        sub_model = {"actions": [action], "pagination": model["pagination"]}
        res = replay_sequential(pages, seeds, sub_model, budget=remaining)
        spent = len(res.trace)
        remaining -= spent
        for t in res.trace:
            t = dict(t)
            t["step"] += step_base
            merged.trace.append(t)
        step_base += spent
        merged.harvested.extend(u for u in res.harvested if u not in set(merged.harvested))
        merged.visited |= res.visited
    return merged


def structure_driven_leaf_fn(example_html: str, threshold: float = 0.8):
    """structure_driven.clj:14-16: leaf iff structurally similar to the
    example page (picklable closure for the worker actors)."""

    def leaf_fn(html: str, url: str, sa: dict) -> bool:
        return structural_similarity(html, example_html) >= threshold

    return leaf_fn


def discussion_forum_stop(num_leaves: int):
    """discussion_forum.clj:48-71: stop when observed leaves ≥ target."""

    def stop_fn(metrics: dict) -> bool:
        return metrics.get("leaves", 0) >= num_leaves

    return stop_fn
