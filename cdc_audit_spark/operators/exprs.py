"""Catalyst expression helpers shared across operators."""

from __future__ import annotations

import weakref
from typing import Callable

from pyspark import SparkContext
from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-SparkContext cache of reusable unresolved expression trees (see
# memo_column). Keyed weakly on the context object so a stopped/replaced
# context drops its cached JVM references with it.
_COLUMN_MEMO: "weakref.WeakKeyDictionary[SparkContext, dict]" = (
    weakref.WeakKeyDictionary())


def memo_column(key: tuple, build: Callable[[], object]):
    """Build-once cache for reusable unresolved Column trees.

    Why this exists (optimization guide §7.3 — driver-side fixed cost):
    every Column operation is one py4j round-trip (~1 ms on this class
    of box), so a builder that assembles a few hundred expression nodes
    spends 0.3-1 s of pure DRIVER latency per call — re-paid on every
    query construction even though the resulting tree is identical.
    Unresolved Columns are immutable and plan-independent (they bind to
    a DataFrame only at analysis), so the hot builders (znorm taps,
    winnow/n-gram token pipelines) memoize their tree per
    (SparkContext, parameters) and hand the SAME Column objects to
    every query that asks — construction collapses to dict lookups.

    ``build()`` runs (uncached) when no context is active; exceptions
    are never cached. The value may be any structure of Columns
    (tuple/list/dict) — callers slot them straight into ``select``."""
    sc = SparkContext._active_spark_context
    if sc is None:
        return build()
    per_sc = _COLUMN_MEMO.get(sc)
    if per_sc is None:
        per_sc = _COLUMN_MEMO.setdefault(sc, {})
    got = per_sc.get(key)
    if got is None:
        got = build()
        per_sc[key] = got
    return got


def bind(expr: Column, fn: Callable[[Column], Column]) -> Column:
    """Let-binding for Catalyst expressions: evaluate ``expr`` ONCE per
    row and pass it to ``fn`` as a higher-order-function lambda variable.

    Why this exists: an expression subtree captured inside a
    higher-order lambda (``transform``/``aggregate``/``filter`` bodies)
    is RE-EVALUATED on every iteration — Spark's interpreted HOF path
    has no caching for captured subtrees, so a sliding-window
    ``transform(sequence(...), i -> f(slice(arr_expr, i, k)))`` whose
    ``arr_expr`` is an inline split/hash pipeline costs O(n^2) per row
    (measured 10-40x on winnow fingerprints and n-gram stages at sf0.1).
    A lambda VARIABLE, by contrast, is a slot read. Wrapping the
    expensive expression in a single-element array and immediately
    transforming over it turns it into exactly such a variable:

        bind(tokens_expr, lambda t: F.transform(..., lambda i: slice(t, ...)))

    Same output, same whole-row-map plan shape, no shuffle, works on
    streaming DataFrames (unlike persist/localCheckpoint
    materialization), and the optimizer cannot re-inline a lambda
    variable the way CollapseProject re-inlines single-use project
    aliases."""
    return F.element_at(F.transform(F.array(expr), fn), 1)
