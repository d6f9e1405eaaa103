"""Streaming corpus hygiene: the cleaning stage as an always-on ingest
filter.

Both cleaning operators are stateless maps, which makes their streaming
form exact (streaming ≡ batch, no watermark, no state store):

  * redaction is a per-row regexp chain;
  * boilerplate removal against a FROZEN blocklist is a per-row array
    filter. The corpus-wide document-frequency aggregation that BUILDS the
    blocklist is inherently batch (it must see the corpus); the standard
    deployment — same as benchmark decontamination — computes the
    blocklist over the historical corpus offline, freezes it, and applies
    it to the live stream map-side. A blocklist is tiny by construction
    (only segments above a document-frequency ceiling), so it ships as a
    broadcast literal, not a join.

Crash semantics: file-source offsets + parquet append under one
checkpoint — the same at-least-once window as stream_sync; dedup by id
downstream or use a transactional table format for exactly-once.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_audit_spark.operators.clean import PII_PATTERNS, redact_patterns

__all__ = ["apply_blocklist", "stream_clean_sync"]

# A corpus blocklist larger than this is a symptom (the DF ceiling is set
# wrong), not an input — refuse rather than compile a megabyte expression.
_MAX_LITERAL_BLOCKLIST = 100_000


def apply_blocklist(
    df: DataFrame,
    id_col: str,
    text_col: str,
    blocked: list[str],
    sep: str = "\n",
    out_col: str = "text_clean",
) -> DataFrame:
    """Map-side form of boilerplate removal against a frozen blocklist:
    per-row split → array filter → reassemble. No explode, no shuffle, no
    state — legal on batch AND streaming frames, and exactly equal to
    ``remove_boilerplate`` when ``blocked`` is that corpus's blocklist
    (pinned by test_stream_clean).
    """
    if len(blocked) > _MAX_LITERAL_BLOCKLIST:
        raise ValueError(
            f"blocklist has {len(blocked)} segments — a document-frequency "
            "ceiling this loose is misconfigured (the blocklist should hold "
            "shared boilerplate, not the corpus)"
        )
    arr = F.split(F.col(text_col), re.escape(sep))
    blocked_arr = F.array(*[F.lit(s) for s in sorted(blocked)])
    kept = F.filter(arr, lambda s: ~F.array_contains(blocked_arr, s))
    return df.withColumns(
        {
            "n_total": F.size(arr).cast("long"),
            "n_kept": F.size(kept).cast("long"),
            "n_dropped": (F.size(arr) - F.size(kept)).cast("long"),
            out_col: F.concat_ws(sep, kept),
        }
    )


def stream_clean_sync(
    spark: SparkSession,
    source_path: str,
    schema,
    out_path: str,
    checkpoint_path: str,
    id_col: str,
    text_col: str,
    blocked: list[str] | None = None,
    sep: str = "\n",
    patterns: dict[str, tuple[str, str]] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Stream documents from a parquet directory, redact PII and strip
    frozen boilerplate, append survivors to ``out_path``. Returns the
    started StreamingQuery.

    The whole pipeline is narrow (map-only): each micro-batch is one
    codegen'd pass, so throughput is the parquet scan rate.
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_path)

    cleaned = redact_patterns(
        stream, id_col, text_col, patterns=PII_PATTERNS if patterns is None else patterns,
        out_col="__redacted",
    )
    # redact first, then strip boilerplate from the redacted text: masks
    # never contain separators, so segment boundaries are stable.
    cleaned = apply_blocklist(
        cleaned, id_col, "__redacted", blocked or [], sep=sep
    ).drop("__redacted")

    writer = (
        cleaned.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
