"""Streaming ingest: availableNow drain equals the batch pipeline, and
a second run with the same checkpoint reprocesses nothing."""

from __future__ import annotations

import os

from extractthinker_spark.corpus import corpus_pandas
from extractthinker_spark.plans.pipeline import extract_main_content
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA
from extractthinker_spark.streaming import run_stream_once


def _span_tuples(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in df.select("doc_id", "spans").collect()
    }


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "landing")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    docs = spark.createDataFrame(
        corpus_pandas(60)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    )
    docs.write.parquet(in_dir)

    run_stream_once(spark, in_dir, out_dir, ckpt)
    got = _span_tuples(spark.read.parquet(out_dir))
    want = _span_tuples(extract_main_content(docs, nest=True))
    assert got == want

    # Second drain with the same checkpoint: no new files -> no new rows.
    def parquet_files():
        return sorted(
            os.path.join(d, f)
            for d, _, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        )

    n_files_before = parquet_files()
    run_stream_once(spark, in_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(want)
    assert parquet_files() == n_files_before

    # Replayed micro-batch (fresh checkpoint -> batch 0 runs again):
    # the per-batch-id dynamic partition overwrite makes the sink
    # idempotent — same rows, no duplicates.
    run_stream_once(spark, in_dir, out_dir, str(tmp_path / "ckpt2"))
    assert _span_tuples(spark.read.parquet(out_dir)) == want
    assert spark.read.parquet(out_dir).count() == len(want)
