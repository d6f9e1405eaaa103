"""Catalyst expression helpers shared across operators."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


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
