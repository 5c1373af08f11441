"""Bucketed storage for co-located joins (the 100 TB join strategy).

At corpus scale, every doc_id-keyed join or re-nest groupBy costs a
full shuffle of the big side. Writing both sides bucketed on
xxhash-of-key into the same bucket count lets Spark's bucketed-scan
rule align partitions at read time: the join/aggregation runs with NO
Exchange on either side (verified by plan assertion in
tests/test_scale_plans.py). On a real deployment this is the Iceberg
``bucket(N, doc_id)`` partition transform; the local twin is the
parquet bucketBy table format.

The reference has no analogue (single-machine, in-memory dicts); this
is pure scale engineering required by the north rule's partitioning
mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str = "doc_id",
    buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist bucketed+sorted by ``key`` (parquet, saveAsTable so the
    bucketing metadata survives for the read-side optimizer)."""
    w = (
        df.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
    )
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str = "doc_id"
) -> DataFrame:
    """Equi-join of two same-bucketed tables — planner emits a
    SortMergeJoin with zero Exchange when bucket specs match."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), key
    )
