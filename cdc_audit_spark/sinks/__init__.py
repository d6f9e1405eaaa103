from cdc_audit_spark.sinks.manifest import (  # noqa: F401
    ClaimBackend,
    CommitConflict,
    HardLinkClaimBackend,
    ManifestTable,
)

__all__ = ["ClaimBackend", "CommitConflict", "HardLinkClaimBackend",
           "ManifestTable"]
