"""Generation-snapshot state shared by the streaming index/view hooks.

stream_exact_index_sync and stream_mview_sync persist cross-batch state as
``gen=<epoch>`` snapshot directories behind an atomically-flipped
``_current.json`` pointer. Snapshots accumulate one per micro-batch; this
module is the GC policy: keep the newest K generations (always including
the pointer's target), delete the rest. Callers run it from the same
foreachBatch hook or a side cron — deleting an old generation can never
break recovery, because replay only ever reads the pointer's target.
"""

from __future__ import annotations

import json
import os
import re
import shutil

__all__ = ["prune_generations", "current_generation"]

_GEN_RE = re.compile(r"^gen=(\d+)$")


def current_generation(state_path: str) -> int | None:
    """Epoch named by ``_current.json``, or None before the first flip."""
    ptr = os.path.join(state_path, "_current.json")
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return int(json.load(f)["epoch"])


def prune_generations(state_path: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` generation snapshots.

    The pointer's target is always retained even if it is not among the
    newest ``keep`` (a stalled stream must never lose its only readable
    state). Returns the deleted epochs, oldest first.
    """
    if keep < 1:
        raise ValueError("keep must be >= 1")
    if not os.path.isdir(state_path):
        return []
    gens = sorted(
        int(m.group(1))
        for d in os.listdir(state_path)
        if (m := _GEN_RE.match(d)) and os.path.isdir(os.path.join(state_path, d))
    )
    cur = current_generation(state_path)
    retain = set(gens[-keep:])
    if cur is not None:
        retain.add(cur)
    deleted = []
    for g in gens:
        if g in retain:
            continue
        shutil.rmtree(os.path.join(state_path, f"gen={g}"))
        deleted.append(g)
    return deleted
