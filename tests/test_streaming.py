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


def test_raw_file_stream_equals_batch(spark, tmp_path):
    """A raw-file landing zone (mixed formats incl. compressed PDF,
    csv-by-extension, gz) drains through sniff->decode->extract to the
    same spans the batch path yields; a second drain with the same
    checkpoint reprocesses nothing."""
    import zlib

    import pyspark.sql.functions as F

    from extractthinker_spark.operators.rawbytes import (
        make_fixture_docx,
        make_fixture_pdf,
        parse_raw_bytes,
    )
    from extractthinker_spark.plans.pipeline import extract_main_content
    from extractthinker_spark.streaming import run_raw_stream_once

    land = tmp_path / "land"
    land.mkdir()
    pages = ["Invoice #7\nTotal: 10", "DRIVER LICENSE\nAge: 9"]
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    files = {
        "a.pdf": make_fixture_pdf(pages, compress=True),
        "b.docx": make_fixture_docx(pages),
        "c.html": b"<html><body><p>hello stream</p></body></html>",
        "d.csv": b"x,y\n1,2",
        "e.txt.gz": co.compress(b"zipped para") + co.flush(),
    }
    for name, data in files.items():
        (land / name).write_bytes(data)

    out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_raw_stream_once(spark, str(land), out_dir, ckpt)
    streamed = _span_tuples(
        spark.read.parquet(out_dir).select("doc_id", "spans")
    )

    batch_raw = spark.createDataFrame(
        [(n, str(land / n), d) for n, d in files.items()],
        "doc_id string, source_uri string, raw binary",
    )
    batch = _span_tuples(
        extract_main_content(
            parse_raw_bytes(batch_raw, uri_col="source_uri").select(
                "doc_id", "spans"
            )
        )
    )
    assert streamed == batch
    assert streamed["a.pdf"][0][1].startswith("Invoice #7")
    assert streamed["d.csv"][0][0] == "table"
    assert streamed["e.txt.gz"][0][1] == "zipped para"

    # replay: same checkpoint -> no duplicate batch output
    run_raw_stream_once(spark, str(land), out_dir, ckpt)
    again = _span_tuples(
        spark.read.parquet(out_dir).select("doc_id", "spans")
    )
    assert again == streamed


def test_stream_quality_gate(spark, tmp_path):
    """Streaming twin of extract_job --quality-gate: failing docs are
    dropped from the sink, verdicts land under <output>/_quality (an
    underscore dir invisible to parquet reads of the output), and the
    gated stream equals the gated batch result."""
    import pyspark.sql.functions as F

    from extractthinker_spark.corpus import corpus_spark
    from extractthinker_spark.functions.textstats import gopher_filter
    from extractthinker_spark.plans.pipeline import doc_text, extract_main_content
    from extractthinker_spark.streaming.ingest import (
        stream_documents,
        stream_extract,
    )

    docs = corpus_spark(spark, 40)
    land = str(tmp_path / "land")
    docs.write.parquet(land)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    th = {"min_words": 30, "min_stop_distinct": 0}
    q = stream_extract(
        stream_documents(spark, land), out, ckpt,
        available_now=True, quality_gate=True, quality_thresholds=th,
    )
    q.awaitTermination()

    got_ids = {
        r["doc_id"]
        for r in spark.read.parquet(out).select("doc_id").collect()
    }
    batch = extract_main_content(docs, nest=True)
    verdict = gopher_filter(
        doc_text(batch).select("doc_id", F.col("content").alias("text")),
        thresholds=th,
    )
    want_ids = {
        r["doc_id"] for r in verdict.filter(F.col("keep")).collect()
    }
    assert got_ids == want_ids and 0 < len(got_ids) < 40
    audit = spark.read.parquet(f"{out}/_quality")
    assert audit.count() == 40
    assert audit.filter(~F.col("keep")).count() == 40 - len(want_ids)


def test_sessionize_stream_equals_batch(spark, tmp_path):
    """Watermarked session_window streaming aggregation drains to the
    same sessions the identical batch plan computes (append mode emits
    only watermark-finalized sessions; availableNow + a far-future
    flush event finalizes everything)."""
    from datetime import datetime

    from extractthinker_spark.streaming.sessions import sessionize_stream

    rows = [
        ("u1", datetime(2026, 1, 1, 10, 0, 0)),
        ("u1", datetime(2026, 1, 1, 10, 10, 0)),   # same session (gap 30m)
        ("u1", datetime(2026, 1, 1, 12, 0, 0)),    # new session
        ("u2", datetime(2026, 1, 1, 10, 5, 0)),
        # far-future watermark flush marker: its own session
        ("zz", datetime(2026, 1, 2, 0, 0, 0)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    land = str(tmp_path / "sess-land")
    df.write.parquet(land)

    batch = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in sessionize_stream(spark.read.parquet(land)).collect()
    }
    assert len(batch) == 4
    k_u1 = [k for k in batch if k[0] == "u1"]
    assert sorted(batch[k] for k in k_u1) == [1, 2]

    stream = (
        spark.readStream.schema("user_id string, ts timestamp")
        .parquet(land)
    )
    out_dir = str(tmp_path / "sess-out")
    q = (
        sessionize_stream(stream, watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "sess-ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.read.parquet(out_dir).collect()
    }
    # every session closed before the watermark (all but the flush
    # marker's own) must match the batch result exactly
    finalized = {k: v for k, v in batch.items() if k[0] != "zz"}
    for k, v in finalized.items():
        assert got.get(k) == v, (k, v, got)


def test_stream_dedup_exact_cross_batch(spark, tmp_path):
    """Streaming exact dedup holds state ACROSS micro-batches
    (maxFilesPerTrigger=1 forces one batch per landing file): a
    duplicate arriving in a later batch is dropped by the engine path
    and ledgered keep=false by the audit path; batch dedup_exact is
    the anchor for what survives."""
    import pyspark.sql.functions as F

    from extractthinker_spark.streaming.dedup import (
        stream_dedup_exact,
        stream_dedup_exact_audit,
    )

    land = tmp_path / "land"
    land.mkdir()
    b1 = spark.createDataFrame(
        [("a", "the same body"), ("b", "unique one")],
        "doc_id string, text string",
    )
    b2 = spark.createDataFrame(
        [("c", "THE  SAME body"), ("d", "unique two"),
         ("e", "unique two")],
        "doc_id string, text string",
    )
    b1.coalesce(1).write.parquet(str(land / "f1"))
    b2.coalesce(1).write.parquet(str(land / "f2"))

    src = (
        spark.readStream.schema("doc_id string, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(land) + "/*")
    )

    out1 = tmp_path / "out1"
    q = (
        stream_dedup_exact(src)
        .writeStream.format("parquet")
        .option("path", str(out1))
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {
        r["doc_id"] for r in spark.read.parquet(str(out1)).collect()
    }
    # one survivor per fingerprint; 'c' normalizes equal to 'a'
    assert len(kept) == 3
    assert "b" in kept and "d" in kept or "e" in kept
    assert not {"a", "c"} <= kept

    out2 = tmp_path / "out2"
    q2 = (
        stream_dedup_exact_audit(src)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out2))
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(180)
    verdicts = {
        r["doc_id"]: (r["keep"], r["prior_copies"])
        for r in spark.read.parquet(str(out2)).collect()
    }
    assert len(verdicts) == 5  # every row ledgered
    assert verdicts["a"] == (True, 0)
    # same-fingerprint doc in the LATER batch: dropped with state count
    assert verdicts["c"][0] is False and verdicts["c"][1] >= 1
    assert verdicts["d"][0] != verdicts["e"][0]  # smallest key kept
    kept_ids = {k for k, (kp, _) in verdicts.items() if kp}
    assert kept_ids == {"a", "b", "d"}


def test_stream_dedup_within_watermark(spark, tmp_path):
    """Bounded-state variant: dedup-within-horizon suppresses
    duplicates inside the watermark window; the ts column is required
    and the query still drains availableNow."""
    import pytest

    from extractthinker_spark.streaming.dedup import stream_dedup_exact

    land = tmp_path / "land"
    land.mkdir()
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("a", "same body", "2026-01-01 10:00:00"),
         ("b", "same body", "2026-01-01 10:05:00"),
         ("c", "other body", "2026-01-01 10:06:00")],
        "doc_id string, text string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.parquet(str(land / "f1"))

    src = spark.readStream.schema(
        "doc_id string, text string, ts timestamp"
    ).parquet(str(land) + "/*")
    with pytest.raises(ValueError, match="needs ts_col"):
        stream_dedup_exact(src, within="1 hour")
    out = tmp_path / "out"
    q = (
        stream_dedup_exact(src, ts_col="ts", within="1 hour")
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = {r["doc_id"] for r in spark.read.parquet(str(out)).collect()}
    assert "c" in kept and len(kept) == 2  # one of a/b suppressed
