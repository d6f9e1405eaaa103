"""Generation-snapshot state shared by the streaming index/view hooks.

stream_exact_index_sync and stream_mview_sync persist cross-batch state as
``gen=<epoch>`` snapshot directories behind an atomically-flipped
``_current.json`` pointer. This module is the SINGLE owner of that
protocol — pointer read (`read_pointer`), commit (`flip_pointer`), replay
detection (`epoch_applied`), and GC (`prune_generations`) — so a fix to
the recovery contract lands in exactly one place.

Recovery contract (foreachBatch checkpoints offsets AFTER the hook):

- Crash BEFORE the flip: restart replays the epoch against the pointer's
  previous target; the operators are deterministic, so the re-derived
  snapshot is identical and the half-written ``gen=<epoch>`` directory is
  simply overwritten.
- Crash AFTER the flip (but before the checkpoint commit): the pointer
  already names the replayed epoch, so the epoch's effects are fully
  durable. The hooks detect this with ``epoch_applied`` and skip — without
  the guard, the replay would read ``gen=N`` via the pointer and
  ``mode("overwrite")`` the SAME directory, which Spark rejects ("cannot
  overwrite a path that is also being read from"), wedging the stream on
  every restart.

Snapshot GC keeps the newest K generations (always including the
pointer's target); deleting an old generation can never break recovery,
because replay only ever reads the pointer's target.
"""

from __future__ import annotations

import json
import os
import re
import shutil

__all__ = [
    "current_generation",
    "epoch_applied",
    "flip_pointer",
    "generation_dir",
    "prune_generations",
    "read_pointer",
]

_GEN_RE = re.compile(r"^gen=(\d+)$")
_POINTER = "_current.json"


def read_pointer(state_path: str) -> dict | None:
    """The ``_current.json`` payload, or None before the first flip."""
    ptr = os.path.join(state_path, _POINTER)
    if not os.path.exists(ptr):
        return None
    with open(ptr) as f:
        return json.load(f)


def current_generation(state_path: str) -> int | None:
    """Epoch named by ``_current.json``, or None before the first flip."""
    p = read_pointer(state_path)
    return None if p is None else int(p["epoch"])


def epoch_applied(state_path: str, epoch_id: int) -> bool:
    """True iff ``epoch_id``'s effects are already durable.

    The flip is strictly ordered after the generation write, so a pointer
    naming ``epoch_id`` (or later — epochs are monotone) proves the
    snapshot is complete; the replayed hook must skip.
    """
    cur = current_generation(state_path)
    return cur is not None and cur >= epoch_id


def generation_dir(state_path: str, epoch_id: int, *parts: str) -> str:
    """Path of epoch ``epoch_id``'s snapshot directory (or a child)."""
    return os.path.join(state_path, f"gen={epoch_id}", *parts)


def flip_pointer(state_path: str, epoch_id: int, payload: dict) -> None:
    """Atomically commit epoch ``epoch_id``: write ``payload`` (plus the
    epoch) to a temp file and rename over ``_current.json``. Callers must
    have finished writing the generation directories named by ``payload``
    before flipping."""
    ptr = os.path.join(state_path, _POINTER)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        json.dump({**payload, "epoch": epoch_id}, f)
    os.replace(tmp, ptr)


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
