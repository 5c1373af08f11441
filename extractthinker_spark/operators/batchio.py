"""Batch JSONL sink + result reader — the reference BatchJob's file
surface, Spark-native.

The reference writes one JSONL request per document with
``{custom_id, method, url, body{...}}`` (batch_job.py:48-70
``_add_method_to_file``) and later parses a JSONL results file keyed
by custom_id (batch_job.py:98-175). The deterministic engine has no
remote batch service, but the FILE FORMATS are part of the API
surface a migrating user holds: ``write_batch_requests`` emits the
identical request shape from a DataFrame (distributed ``write.json``
— one shuffle-free pass, arbitrarily many part files), and
``read_batch_results`` loads a results JSONL back into (custom_id,
content) rows for the downstream join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

BATCH_URL = "/v1/chat/completions"


def batch_request_df(
    df: DataFrame,
    id_col: str = "doc_id",
    content_col: str = "content",
    model: str = "deterministic-rules",
    max_tokens: int = 8000,
    temperature: float = 0.0,
) -> DataFrame:
    """(custom_id, method, url, body) rows in the reference's batch
    request shape; ``body.messages`` carries the document content as
    the single user message."""
    return df.select(
        F.col(id_col).cast("string").alias("custom_id"),
        F.lit("POST").alias("method"),
        F.lit(BATCH_URL).alias("url"),
        F.struct(
            F.lit(model).alias("model"),
            F.array(
                F.struct(
                    F.lit("user").alias("role"),
                    F.col(content_col).alias("content"),
                )
            ).alias("messages"),
            F.lit(max_tokens).alias("max_tokens"),
            F.lit(temperature).alias("temperature"),
        ).alias("body"),
    )


def write_batch_requests(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    content_col: str = "content",
    **kwargs,
) -> None:
    """Distributed JSONL write of the request file (the reference
    serializes row-by-row on one machine; df.write.json is the same
    bytes per line, any number of part files)."""
    batch_request_df(df, id_col, content_col, **kwargs).write.mode(
        "overwrite"
    ).json(path)


def read_batch_results(
    spark: SparkSession, path: str, content_schema: str | None = None
) -> DataFrame:
    """Results JSONL → (custom_id, content [, parsed]) rows.

    Accepts the OpenAI-batch result nesting the reference polls for
    (``response.body.choices[0].message.content``) and falls back to a
    flat (custom_id, content) layout. ``content_schema`` additionally
    parses the content as JSON into a ``parsed`` struct.
    """
    raw = spark.read.json(path)
    cols = set(raw.columns)
    if "response" in cols:
        content = F.col("response.body.choices")[0]["message"]["content"]
    else:
        content = F.col("content")
    out = raw.select(
        F.col("custom_id").cast("string").alias("custom_id"),
        content.alias("content"),
    )
    if content_schema is not None:
        out = out.withColumn("parsed", F.from_json("content", content_schema))
    return out
