from cdc_audit_spark.sinks.manifest import (  # noqa: F401
    CommitConflict,
    ManifestTable,
)

__all__ = ["CommitConflict", "ManifestTable"]
