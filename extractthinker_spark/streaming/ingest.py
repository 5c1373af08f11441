"""Streaming ingest: the same extraction stages over a file stream.

The reference has no streaming engine (SURVEY.md §2.10) — its nearest
analogue is the async BatchJob poll loop
(/root/reference/extract_thinker/batch_job.py:98-143). Because every
operator in this engine is stateless per document, the batch pipeline
lifts to Structured Streaming unchanged: ``readStream`` on the corpus
directory → ``extract_main_content`` → ``foreachBatch`` parquet/Iceberg
appends. No watermarks or stateful operators are needed; exactly-once
lands on the sink's idempotent batch-id handling (Spark's
checkpointLocation tracks which micro-batches committed — the
streaming twin of scale/checkpoint.py's per-bucket manifests).

At 100 TB this is the continuous-ingest topology: new parquet files
appear in the landing zone (``maxFilesPerTrigger`` bounds micro-batch
size), extraction is embarrassingly parallel per document, and the
only shuffle per micro-batch is the re-nest groupBy.

Exactly-once: the parquet sink writes each micro-batch to its own
``_batch_id=<id>`` partition directory with dynamic partition
OVERWRITE, so a batch replayed after a failure between write and
checkpoint commit overwrites its own output instead of appending a
duplicate — the idempotent-per-batch-id pattern foreachBatch requires
(an Iceberg sink gets the same via replacePartitions/overwrite by
batch filter).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from extractthinker_spark.plans.pipeline import extract_main_content
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA


def stream_documents(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a parquet landing zone of documents(doc_id, spans)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_extract(
    stream: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = False,
    quality_gate: bool = False,
    quality_thresholds: dict | None = None,
) -> StreamingQuery:
    """Run the extraction pipeline on a stream via foreachBatch.

    foreachBatch (rather than a direct writeStream.parquet) so the sink
    can be swapped for ``df.writeTo(iceberg_table).append()`` on a real
    cluster, and so per-batch lineage metrics ride along.

    ``quality_gate`` applies the Gopher filter per micro-batch (the
    streaming twin of ``extract_job --quality-gate``): failing docs are
    dropped from the sink and the full verdict lands under
    ``<output>/_quality/_batch_id=N`` — the underscore prefix keeps it
    invisible to parquet reads of the output dir, and the same
    dynamic-partition overwrite makes replays idempotent.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        out = extract_main_content(batch_df, nest=True)
        if quality_gate:
            from extractthinker_spark.functions.textstats import gopher_filter
            from extractthinker_spark.plans.pipeline import doc_text

            # materialize once: the verdict write, the keep join and
            # the data write would otherwise each re-extract the batch
            out = out.localCheckpoint()

            verdict = gopher_filter(
                doc_text(out).select(
                    "doc_id", F.col("content").alias("text")
                ),
                thresholds=quality_thresholds,
            ).withColumn("_batch_id", F.lit(batch_id))
            (
                verdict.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .parquet(f"{output_dir}/_quality")
            )
            out = out.join(
                verdict.filter(F.col("keep")).select("doc_id"), "doc_id"
            )
        out = out.withColumn("_batch_id", F.lit(batch_id))
        # idempotent on replay: dynamic partition overwrite replaces
        # ONLY this batch's partition, never appends it twice
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(output_dir)
        )

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_stream_once(
    spark: SparkSession, input_dir: str, output_dir: str, checkpoint_dir: str
) -> None:
    """Drain everything currently in the landing zone, then stop
    (availableNow trigger) — the batch-incremental mode."""
    q = stream_extract(
        stream_documents(spark, input_dir),
        output_dir,
        checkpoint_dir,
        available_now=True,
    )
    q.awaitTermination()


def stream_raw_documents(
    spark: SparkSession,
    input_dir: str,
    path_glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over a landing zone of RAW FILES (any format the
    sniffer knows): the binaryFile streaming source feeds the same
    sniff→decode mapInPandas as the batch path (streams and batches
    share every operator — parse_raw_bytes is stateless per row), with
    the file path's extension as the dispatch hint. Yields the
    documents(doc_id, spans) stream stream_extract expects."""
    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length bigint, "
        "content binary"
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    from extractthinker_spark.operators.rawbytes import parse_raw_bytes

    raw = reader.load(input_dir).select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("doc_id"),
        F.col("path").alias("source_uri"),
        F.col("content").alias("raw"),
    )
    return parse_raw_bytes(raw, uri_col="source_uri").select(
        "doc_id", "spans"
    )


def run_raw_stream_once(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    path_glob: str | None = None,
    quality_gate: bool = False,
    quality_thresholds: dict | None = None,
) -> None:
    """Drain a raw-file landing zone through sniff → decode → extract
    (optionally Gopher-gated) with the idempotent per-batch-id sink."""
    q = stream_extract(
        stream_raw_documents(spark, input_dir, path_glob),
        output_dir,
        checkpoint_dir,
        available_now=True,
        quality_gate=quality_gate,
        quality_thresholds=quality_thresholds,
    )
    q.awaitTermination()
