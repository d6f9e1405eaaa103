"""cdc_audit_spark — a PySpark-native change-data-capture + analytics engine.

A from-scratch re-expression of the capabilities of dan-da/cdc_audit
(reference: /root/reference/cdc_audit_gen_mysql.php, cdc_audit_sync_mysql.php)
on Apache Spark, extended with large-scale data-pipeline operators
(dedup, similarity search, text analysis, multimodal columns).

Design principles (Spark-first, 100 TB-ready):
  * Declarative DataFrame/SQL plans — let Catalyst push filters/prune columns.
  * Shuffle-conscious: broadcast small sides, partial aggregation, AQE on.
  * JVM-side expressions in hot paths; Arrow-batched pandas UDFs only where
    built-ins genuinely cannot express the semantics.
"""

from cdc_audit_spark.schema import audit_schema, audit_table_name, AUDIT_COLUMNS
from cdc_audit_spark.capture import snapshot_diff, apply_changes
from cdc_audit_spark.sync import (
    get_watermark,
    read_sink,
    sync_table,
    table_checksum,
    verify_sink,
)
from cdc_audit_spark.compact import keep_last, keep_last_per_key
from cdc_audit_spark.sinks import (
    ClaimBackend,
    CommitConflict,
    HardLinkClaimBackend,
    ManifestTable,
)
from cdc_audit_spark.sources import (
    read_manifest_stream,
    register_manifest_stream,
    register_manifest_table,
)

__all__ = [
    "ClaimBackend",
    "CommitConflict",
    "HardLinkClaimBackend",
    "read_manifest_stream",
    "register_manifest_stream",
    "register_manifest_table",
    "ManifestTable",
    "audit_schema",
    "audit_table_name",
    "AUDIT_COLUMNS",
    "snapshot_diff",
    "apply_changes",
    "sync_table",
    "get_watermark",
    "read_sink",
    "table_checksum",
    "verify_sink",
    "keep_last",
    "keep_last_per_key",
]

__version__ = "0.1.0"
