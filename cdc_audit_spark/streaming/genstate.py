"""Generation-snapshot state shared by the streaming index/view hooks.

Generation-snapshot streaming hooks (e.g. stream_exact_index_sync)
persist cross-batch state as
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

Run identity: foreachBatch epoch ids are scoped to the CHECKPOINT, not to
the state path. If a stream restarts with a fresh (or deleted) checkpoint
against an existing state directory whose pointer says e.g. epoch 10, the
new run's epochs restart at 0 and ``pointer >= epoch`` would silently skip
batches 0..10 of the new run — losing any new source files they contain.
The pointer therefore records the checkpoint's streaming-query id
(``run_id``); ``epoch_applied`` FAILS LOUDLY on a mismatch instead of
guessing. A checkpoint and its state path must be created and deleted
together; to rebuild state from scratch, delete both.
"""

from __future__ import annotations

import json
import os
import re
import shutil

__all__ = [
    "GenerationRunMismatch",
    "checkpoint_run_id",
    "current_generation",
    "epoch_applied",
    "flip_pointer",
    "generation_dir",
    "prune_generations",
    "read_pointer",
]


class GenerationRunMismatch(RuntimeError):
    """The state pointer was written by a different streaming run
    (checkpoint) than the one now applying epochs. Epoch numbers from
    different runs are incomparable — proceeding could silently skip or
    double-apply batches."""

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


def checkpoint_run_id(checkpoint_path: str) -> str | None:
    """The streaming-query id recorded in ``<checkpoint>/metadata``.

    Spark writes this file at stream start (before batch 0) and preserves
    it across restarts with the same checkpoint; a deleted/re-created
    checkpoint gets a fresh id. None if the file doesn't exist yet (e.g.
    hooks driven outside a real stream, as in unit tests).
    """
    meta = os.path.join(checkpoint_path, "metadata")
    if not os.path.exists(meta):
        return None
    try:
        with open(meta) as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


def epoch_applied(state_path: str, epoch_id: int,
                  run_id: str | None = None) -> bool:
    """True iff ``epoch_id``'s effects are already durable.

    The flip is strictly ordered after the generation write, so a pointer
    naming ``epoch_id`` (or later — epochs are monotone) proves the
    snapshot is complete; the replayed hook must skip.

    ``run_id`` is the current checkpoint's streaming-query id. Epoch ids
    are only monotone WITHIN one checkpoint, so if the pointer names a
    different run this comparison is meaningless and the call raises
    :class:`GenerationRunMismatch` — silently returning True here is how a
    fresh-checkpoint restart loses data. Either side being None (legacy
    pointer, or hooks driven outside a stream) skips the identity check.
    """
    p = read_pointer(state_path)
    if p is None:
        return False
    prev_run = p.get("run_id")
    if run_id is not None and prev_run is not None and prev_run != run_id:
        raise GenerationRunMismatch(
            f"state at {state_path!r} was written by streaming run "
            f"{prev_run} but the current checkpoint is run {run_id}: epoch "
            f"ids are checkpoint-scoped, so batch {epoch_id} of this run "
            "cannot be compared with the pointer. The checkpoint and state "
            "directories must be created and deleted TOGETHER; to rebuild, "
            "delete both and re-run."
        )
    return int(p["epoch"]) >= epoch_id


def generation_dir(state_path: str, epoch_id: int, *parts: str) -> str:
    """Path of epoch ``epoch_id``'s snapshot directory (or a child)."""
    return os.path.join(state_path, f"gen={epoch_id}", *parts)


def flip_pointer(state_path: str, epoch_id: int, payload: dict,
                 run_id: str | None = None) -> None:
    """Atomically commit epoch ``epoch_id``: write ``payload`` (plus the
    epoch and the owning run's identity) to a temp file and rename over
    ``_current.json``. Callers must have finished writing the generation
    directories named by ``payload`` before flipping.

    ``run_id=None`` (checkpoint metadata unreadable this epoch, or hooks
    driven outside a stream) carries the EXISTING pointer's run_id forward
    rather than dropping it: one transient metadata read failure must not
    erase the run identity and silently disable the
    :class:`GenerationRunMismatch` fresh-checkpoint guard."""
    ptr = os.path.join(state_path, _POINTER)
    tmp = ptr + ".tmp"
    if run_id is None:
        prev = read_pointer(state_path)
        run_id = prev.get("run_id") if prev else None
    extra = {"run_id": run_id} if run_id is not None else {}
    with open(tmp, "w") as f:
        json.dump({**payload, "epoch": epoch_id, **extra}, f)
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
