from cdc_audit_spark.sources.jdbc_cdc import (
    incremental_subquery,
    partition_predicates,
    JdbcBatchPlan,
    plan_incremental_batch,
    poll_sync,
)
from cdc_audit_spark.sources.manifest_stream import (
    ManifestStreamDataSource,
    read_manifest_stream,
    register_manifest_stream,
)
from cdc_audit_spark.sources.manifest_table import (
    ManifestTableDataSource,
    register_manifest_table,
)

__all__ = [
    "incremental_subquery",
    "partition_predicates",
    "JdbcBatchPlan",
    "plan_incremental_batch",
    "poll_sync",
    "ManifestStreamDataSource",
    "ManifestTableDataSource",
    "register_manifest_table",
    "read_manifest_stream",
    "register_manifest_stream",
]
