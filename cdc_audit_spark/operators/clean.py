"""Corpus-hygiene operators: corpus-driven boilerplate removal and
pattern redaction — the cleaning stages a training-data pipeline runs
between ingestion and dedup.

Reference parity: the reference engine (dan-da/cdc_audit) has no text
surface; these extend SURVEY §2.11 (LLM-pipeline operators) alongside
dedup/decontam. Design sources are the public corpus-cleaning recipes
(C4/MassiveText-style duplicate-line removal, PII masking) re-expressed
as Spark plans.

Scale shape (100 TB corpus):
  * ``remove_boilerplate`` — the only shuffled stage aggregates DISTINCT
    (segment, doc) pairs to document frequencies; segments travel as
    8-byte xxhash64 keys, never as text. The resulting blocklist is tiny
    by construction (only segments above a document-frequency ceiling can
    enter it), so the removal join is a broadcast anti-join against the
    exploded corpus — the corpus itself shuffles once, on doc_id, for the
    ordered reassembly.
  * ``redact_patterns`` — pure map-side regexp chain, whole-stage
    codegen, no shuffle, no Python.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "boilerplate_blocklist",
    "remove_boilerplate",
    "redact_patterns",
    "PII_PATTERNS",
]

#: Redaction presets. RE2/Java-compatible subset only (character classes,
#: bounded repeats, \b) so the same pattern string runs on Spark (Java
#: regex) and the DuckDB oracle (RE2) with identical match semantics.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d[\d().\- ]{6,}\d", "<PHONE>"),
}


def _segments(df: DataFrame, id_col: str, text_col: str, sep: str) -> DataFrame:
    """(id, pos, seg) — one row per separator-delimited segment.

    ``sep`` is a literal separator (escaped into the split regex), matching
    DuckDB's string_split semantics: consecutive separators yield empty
    segments on both engines.
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), re.escape(sep))).alias("pos", "seg"),
    )


def boilerplate_blocklist(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str,
    max_doc_frac: float,
    n_docs: int | None = None,
) -> DataFrame:
    """Segments whose document frequency exceeds ``max_doc_frac`` of the
    corpus — the shared headers/footers/navigation a line-level cleaner
    strips. Returns (seg, ndocs).

    ``n_docs`` (corpus size) is counted if not given. The threshold is
    ``floor(max_doc_frac * n_docs)``, exceeded strictly — the exact
    arithmetic the SQL oracles mirror.
    """
    if n_docs is None:
        n_docs = df.count()
    threshold = int(math.floor(max_doc_frac * n_docs))
    return (
        _segments(df, id_col, text_col, sep)
        .select("seg", id_col)
        .distinct()
        .groupBy("seg")
        .agg(F.count("*").alias("ndocs"))
        .filter(F.col("ndocs") > threshold)
    )


def remove_boilerplate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    max_doc_frac: float = 0.5,
    out_col: str = "text_clean",
) -> DataFrame:
    """Corpus-wide duplicate-segment removal (MassiveText/C4-style line
    dedup, separator-parameterized): drop every segment that occurs in more
    than ``max_doc_frac`` of documents, reassemble the rest in original
    order.

    Appends n_total, n_kept, n_dropped, ``out_col`` to the input columns
    (preserve-all, so the cleaner composes into pipelines). Documents
    whose every segment is boilerplate survive with an empty string — a
    cleaner must never silently drop document rows (downstream joins rely
    on the id set being stable; emptiness is the downstream filter's
    decision).
    """
    segs = _segments(df, id_col, text_col, sep)
    blocked = boilerplate_blocklist(df, id_col, text_col, sep, max_doc_frac)
    kept = segs.join(F.broadcast(blocked.select("seg")), "seg", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").alias("__n_kept"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
        ).alias("__clean"),
    )
    n_total = F.size(F.split(F.col(text_col), re.escape(sep)))
    return (
        df.join(rebuilt, id_col, "left")
        .withColumns(
            {
                "n_total": n_total.cast("long"),
                "n_kept": F.coalesce(F.col("__n_kept"), F.lit(0)).cast("long"),
                "n_dropped": (n_total - F.coalesce(F.col("__n_kept"), F.lit(0))).cast("long"),
                out_col: F.coalesce(F.col("__clean"), F.lit("")),
            }
        )
        .drop("__n_kept", "__clean")
    )


def redact_patterns(
    df: DataFrame,
    id_col: str,
    text_col: str,
    patterns: dict[str, tuple[str, str]] | None = None,
    out_col: str = "text_redacted",
) -> DataFrame:
    """Mask every match of each named pattern, counting matches per
    pattern per document. Patterns apply in dict order and each count is
    taken on the text as already redacted by the EARLIER patterns (so a
    phone pattern never double-counts digits the email mask consumed) —
    the same chain any engine can replay for exact parity.

    Appends n_<name> per pattern, n_redacted (total), and ``out_col`` to
    the input columns (preserve-all, so the operator composes into
    pipelines and streams). Map-side only.
    """
    del id_col  # kept in the signature for symmetry with the other cleaners
    patterns = PII_PATTERNS if patterns is None else patterns
    new_cols: dict[str, Column] = {}
    cur = F.col(text_col)
    for name, (pat, rep) in patterns.items():
        new_cols[f"n_{name}"] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, rep)
    total = None
    for name in patterns:
        c = new_cols[f"n_{name}"]
        total = c if total is None else total + c
    new_cols["n_redacted"] = total.cast("long")
    new_cols[out_col] = cur
    return df.withColumns(new_cols)
