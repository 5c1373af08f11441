"""SparkSession factory with scale-appropriate defaults.

The settings below are what we would ship for a 1000-executor cluster
run; in this sandbox they apply to local[k]. Arrow is mandatory — every
custom operator is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Documents can be large (mega-docs have 1000+ spans); keep Arrow
# batches small enough that a batch of interleaved spans fits in
# executor memory even at p99 document size.
ARROW_MAX_RECORDS = 2048


def get_spark(
    app_name: str = "extractthinker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS),
        )
        # Nested-schema pruning so unused span struct fields are never read.
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
