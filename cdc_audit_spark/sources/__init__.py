from cdc_audit_spark.sources.jdbc_cdc import (
    incremental_subquery,
    partition_predicates,
    JdbcBatchPlan,
    plan_incremental_batch,
    poll_sync,
)

__all__ = [
    "incremental_subquery",
    "partition_predicates",
    "JdbcBatchPlan",
    "plan_incremental_batch",
    "poll_sync",
]
