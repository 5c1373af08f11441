"""Scale hardening: salting, sub-batching round-trip, lineage metrics,
checkpoint/resume (north_rule §9 of SURVEY.md build plan)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.corpus import corpus_pandas
from extractthinker_spark.plans.pipeline import extract_main_content
from extractthinker_spark.scale import (
    CheckpointedRun,
    doc_metrics,
    remerge_subbatches,
    salt_repartition,
    subbatch_oversized,
    task_metrics,
)
from extractthinker_spark.scale.checkpoint import WaveFailure
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

N_DOCS = 120


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        corpus_pandas(N_DOCS)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    ).cache()


def _span_tuples(df):
    rows = df.select("doc_id", "spans").collect()
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in rows
    }


def test_salt_repartition_spread_and_content(spark, docs):
    salted = salt_repartition(docs, 8, salt=7)
    assert salted.rdd.getNumPartitions() == 8
    sizes = (
        salted.select(F.spark_partition_id().alias("p"))
        .groupBy("p")
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    # Uniform-ish spread: no partition holds more than 3x the mean.
    assert max(counts) <= 3 * (N_DOCS / 8)
    assert _span_tuples(salted) == _span_tuples(docs)


def test_subbatch_roundtrip_preserves_order(spark, docs):
    sub = subbatch_oversized(docs, max_spans=3)
    # every sub-row bounded
    assert sub.filter(F.size("spans") > 3).count() == 0
    # mega docs actually split
    n_multi = sub.filter(F.col("n_subs") > 1).select("doc_id").distinct().count()
    assert n_multi > 0
    merged = remerge_subbatches(sub.select("doc_id", "sub_id", "spans"))
    assert _span_tuples(merged) == _span_tuples(docs)


def test_subbatch_then_extract_equals_direct(spark, docs):
    """Sub-batched extraction must equal whole-doc extraction exactly
    (the giant-doc path may not change results)."""
    direct = extract_main_content(docs)
    sub = subbatch_oversized(docs, max_spans=2)
    # transform each sub-row as its own "document", then re-merge and
    # re-sequence offsets per the pipeline's convention.
    sub2 = sub.select(
        F.col("doc_id").alias("orig_doc_id"),
        "sub_id",
        F.concat_ws("#", "doc_id", "sub_id").alias("doc_id"),
        "spans",
    )
    extracted = extract_main_content(
        sub2.select("doc_id", "spans"), nest=True
    ).join(
        sub2.select("doc_id", "orig_doc_id", "sub_id"), "doc_id"
    )
    merged = remerge_subbatches(
        extracted.select(
            F.col("orig_doc_id").alias("doc_id"), "sub_id", "spans"
        )
    )
    # re-sequence offsets 0..n-1 like the pipeline does
    merged = merged.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s, i: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    assert _span_tuples(merged) == _span_tuples(direct)


def test_doc_and_task_metrics(spark, docs):
    dm = doc_metrics(docs)
    row = dm.agg(
        F.sum("n_spans").alias("s"), F.sum("n_bytes").alias("b")
    ).collect()[0]
    total_spans = docs.select(F.sum(F.size("spans"))).collect()[0][0]
    assert row["s"] == total_spans
    assert row["b"] > 0

    tm = task_metrics(salt_repartition(docs, 6))
    rows = tm.collect()
    assert sum(r["n_docs"] for r in rows) == N_DOCS
    assert sum(r["n_spans"] for r in rows) == total_spans
    assert len(rows) <= 6


def test_checkpoint_resume(spark, docs, tmp_path):
    out_a = str(tmp_path / "single")
    out_b = str(tmp_path / "resumed")
    transform = lambda df: extract_main_content(df, nest=True)  # noqa: E731

    # Reference: one uninterrupted run.
    run_a = CheckpointedRun(out_a, n_buckets=8, wave_size=3, input_token="t1")
    stats_a = run_a.run(spark, docs, transform)
    assert stats_a["waves_run"] == 3
    expected = _span_tuples(run_a.read_output(spark))
    assert len(expected) == N_DOCS

    # Crash after the first wave, then resume.
    run_b = CheckpointedRun(out_b, n_buckets=8, wave_size=3, input_token="t1")
    with pytest.raises(WaveFailure):
        run_b.run(spark, docs, transform, _fail_after_waves=1)
    done_after_crash = run_b.done_buckets()
    assert 0 < len(done_after_crash) < 8
    # Record mtimes of committed bucket dirs — resume must not rewrite.
    mtimes = {
        b: os.path.getmtime(run_b._bucket_data_dir(b))
        for b in done_after_crash
        if os.path.isdir(run_b._bucket_data_dir(b))
    }
    stats_b = CheckpointedRun(
        out_b, n_buckets=8, wave_size=3, input_token="t1"
    ).run(spark, docs, transform)
    assert stats_b["skipped_buckets"] == len(done_after_crash)
    for b, m in mtimes.items():
        assert os.path.getmtime(run_b._bucket_data_dir(b)) == m

    resumed = _span_tuples(
        CheckpointedRun(out_b, n_buckets=8, input_token="t1").read_output(spark)
    )
    assert resumed == expected

    # Manifests carry lineage counts that sum to the corpus.
    manifests = run_b.manifests()
    assert sum(m["n_docs"] for m in manifests) == N_DOCS
    # A changed input_token invalidates every bucket.
    assert (
        CheckpointedRun(out_b, n_buckets=8, input_token="t2").done_buckets()
        == set()
    )
