"""Scale hardening: skew salting, sub-batching, lineage metrics,
checkpoint/resume (north_rule: "explicitly salts and repartitions on
doc_id hash to defeat large-document skew, uses Iceberg snapshot-based
checkpointing so failed runs resume per-partition with lineage +
span-count/byte metrics emitted per task")."""

from extractthinker_spark.scale.skew import (
    salt_repartition,
    subbatch_oversized,
    remerge_subbatches,
)
from extractthinker_spark.scale.metrics import task_metrics, doc_metrics
from extractthinker_spark.scale.checkpoint import CheckpointedRun

__all__ = [
    "salt_repartition",
    "subbatch_oversized",
    "remerge_subbatches",
    "task_metrics",
    "doc_metrics",
    "CheckpointedRun",
]
