"""End-to-end spark-submit entrypoint: run, output equality, resume."""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.corpus import corpus_spark
from extractthinker_spark.plans.pipeline import extract_main_content
from extractthinker_spark.scale.checkpoint import CheckpointedRun
from extractthinker_spark.scale.skew import salt_repartition


def _span_tuples(df):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in df.select("doc_id", "spans").collect()
    }


def test_extract_job_transform_and_resume(spark, tmp_path):
    """The job's transform (salt + extract) through CheckpointedRun
    equals the direct pipeline, and a second run skips all buckets."""
    docs = corpus_spark(spark, 80)

    def transform(df):
        return extract_main_content(salt_repartition(df, 4), nest=True)

    run = CheckpointedRun(str(tmp_path / "run"), n_buckets=8, wave_size=4,
                          input_token="tok-1")
    stats = run.run(spark, docs, transform)
    assert stats["skipped_buckets"] == 0 and stats["docs"] == 80

    got = _span_tuples(run.read_output(spark).drop("bucket"))
    want = _span_tuples(extract_main_content(docs, nest=True))
    assert got == want

    # resume: everything already committed
    stats2 = run.run(spark, docs, transform)
    assert stats2["skipped_buckets"] == 8 and stats2["waves_run"] == 0

    # lineage metrics exist and cover all docs
    m = run.read_metrics(spark)
    assert m.agg(F.sum("n_docs")).collect()[0][0] == 80


def test_extract_job_cli(tmp_path, spark):
    """argparse surface of jobs/extract_job.py (reuses the live session
    via get_spark's getOrCreate)."""
    import jobs.extract_job as job

    out = str(tmp_path / "cli-run")
    job.main([
        "--synthetic", "40", "--output", out, "--input-token", "t0",
        "--n-buckets", "4", "--wave-size", "2", "--salt-partitions", "4",
    ], stop=False)
    got = spark.read.parquet(f"{out}/data")
    assert got.count() == 40
    assert {f.name for f in got.schema.fields} >= {"doc_id", "spans"}


def test_extract_job_raw_input(tmp_path, spark):
    """--raw-input drives the binaryFile road end to end through the
    checkpointed run: mixed raw files in, extracted spans out."""
    import jobs.extract_job as job
    from extractthinker_spark.operators.rawbytes import make_fixture_pdf

    land = tmp_path / "rawland"
    land.mkdir()
    (land / "a.pdf").write_bytes(
        make_fixture_pdf(["Invoice #3\nTotal: 7"], compress=True)
    )
    (land / "b.html").write_bytes(
        b"<html><body><p>raw job body</p></body></html>"
    )
    (land / "c.csv").write_bytes(b"k,v\n1,2")

    out = str(tmp_path / "raw-run")
    job.main([
        "--raw-input", str(land), "--output", out, "--input-token", "r0",
        "--n-buckets", "2", "--wave-size", "2",
    ], stop=False)
    got = {
        r["doc_id"]: [(s["kind"], s["text"]) for s in r["spans"]]
        for r in spark.read.parquet(f"{out}/data").collect()
    }
    assert got["a.pdf"][0][1].startswith("Invoice #3")
    assert got["b.html"] == [("text", "raw job body")]
    assert got["c.csv"][0][0] == "table"


def test_extract_job_quality_gate_resume(tmp_path, spark):
    """--quality-gate under checkpoint/resume (VERDICT r3 task 8): a
    killed gated run resumes correctly, failing documents are dropped
    from the output, and per-wave reject reasons land in _metrics."""
    import jobs.extract_job as job

    out = str(tmp_path / "gated-run")
    argv = [
        "--synthetic", "60", "--output", out, "--input-token", "tg",
        "--n-buckets", "6", "--wave-size", "2",
        "--quality-gate", "--quality-thresholds",
        '{"min_words": 30, "min_stop_distinct": 0}',
    ]

    job.main(argv, stop=False)
    run = CheckpointedRun(out, n_buckets=6, wave_size=2, input_token="tg")
    assert len(run.done_buckets()) == 6

    # resume: everything committed, nothing re-run, audit intact
    job.main(argv, stop=False)
    assert len(run.done_buckets()) == 6

    # gate semantics: output keeps only passing docs; audit records all
    verdicts = run.read_audit(spark, "quality")
    n_total = verdicts.count()
    n_keep = verdicts.filter(F.col("keep")).count()
    n_out = run.read_output(spark).count()
    assert n_total == 60
    assert n_out == n_keep
    reasons = {
        r["reject_reason"]
        for r in verdicts.filter(~F.col("keep")).collect()
    }
    if n_keep < n_total:
        assert reasons and None not in reasons
    # kept doc_ids match the verdict exactly
    kept_ids = {r["doc_id"] for r in run.read_output(spark)
                .select("doc_id").collect()}
    want_ids = {r["doc_id"] for r in verdicts.filter(F.col("keep"))
                .select("doc_id").collect()}
    assert kept_ids == want_ids


def test_extract_job_warc_input(tmp_path, spark):
    """--warc-input: crawl archives through the checkpointed run —
    response records become per-URI documents with extracted spans."""
    import jobs.extract_job as job
    from extractthinker_spark.operators.warc import make_fixture_warc

    land = tmp_path / "warcland"
    land.mkdir()
    recs = [
        ("https://a.example/p.html", "text/html",
         b"<html><body><p>warc page body</p></body></html>"),
        ("https://b.example/t.txt", "text/plain", b"warc text body"),
    ]
    (land / "crawl-00000.warc.gz").write_bytes(
        make_fixture_warc(recs, gzip_members=True)
    )
    out = str(tmp_path / "warc-run")
    job.main([
        "--warc-input", str(land), "--output", out, "--input-token", "w0",
        "--n-buckets", "2", "--wave-size", "2",
    ], stop=False)
    got = {
        r["doc_id"]: [(s["kind"], s["text"]) for s in r["spans"]]
        for r in spark.read.parquet(f"{out}/data").collect()
    }
    assert got["https://a.example/p.html"] == [("text", "warc page body")]
    assert got["https://b.example/t.txt"] == [("text", "warc text body")]


def test_curate_job_funnel(spark, tmp_path):
    """The full curation funnel end-to-end: C4 kills the lorem page,
    the language gate drops German, exact dedup keeps one of two
    identical docs, near-dup keeps the canonical of a close pair,
    and the audit funnel records each stage's survivor count
    monotonically."""
    import json

    from jobs.curate_job import main

    good = ("This is a proper sentence with enough words in it today.\n"
            "Another full sentence follows the first one right away.\n"
            "And a third sentence closes out this page quite nicely.\n"
            "A fourth line keeps the document comfortably long enough.")
    near = good.replace("nicely", "neatly")
    de = ("Der Hund und die Katze sind heute nicht in das grosse Haus "
          "gelaufen und bleiben lieber draussen im Garten sitzen.\n"
          "Ein zweiter Satz folgt direkt auf den ersten Satz hier.\n"
          "Und ein dritter Satz beendet die Seite ordentlich jetzt.")
    rows = [
        ("d1", good),
        ("d2", good),                      # exact duplicate of d1
        ("d3", near),                      # near duplicate of d1
        ("d4", good + "\nlorem ipsum dolor sit amet consectetur adipiscing."),
        ("d5", de),                        # german: language gate
        ("d6", "Email me at bob@example.org for the complete report today.\n"
               "A second proper sentence pads this document further now.\n"
               "A third proper sentence finishes the page properly here."),
    ]
    docs = spark.createDataFrame(
        [(k, [{"kind": "text", "text": t, "media_ref": None,
               "offset": 0}]) for k, t in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    docs.write.parquet(inp)

    report = main(
        ["--input", inp, "--output", out, "--languages", "en",
         "--no-gopher", "--master", "local[4]"],
        stop=False,
    )
    funnel = report["funnel"]
    assert funnel["extracted"] == 6
    assert funnel["after_c4"] == 5            # d4 lorem dropped
    assert funnel["after_language"] == 4      # d5 german dropped
    assert funnel["after_exact_dedup"] == 3   # d2 == d1
    assert funnel["after_near_dedup"] == 2    # d3 ~ d1, d1 canonical
    vals = list(funnel.values())
    assert vals == sorted(vals, reverse=True)  # monotone funnel

    final = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out + "/data").collect()
    }
    assert set(final) == {"d1", "d6"}
    assert "bob@example.org" not in final["d6"]  # PII scrubbed
    assert "[EMAIL]" in final["d6"]
    on_disk = json.load(open(out + "/_audit/funnel.json"))
    assert on_disk["funnel"] == funnel


def test_curate_job_substring_and_host_branches(spark, tmp_path):
    """The optional funnel stages: --substring-dedup splices planted
    cross-doc repeats out of surviving docs; --url-input caps per
    host and writes host stats."""
    import json

    from jobs.curate_job import main

    shared = ("this exact boilerplate legal disclaimer paragraph "
              "appears verbatim across documents today")
    uniq = [
        "The marmot colony dug elaborate burrow networks under the "
        "alpine meadow while researchers mapped every tunnel exit.",
        "Submarine cables carry optical signals across the atlantic "
        "with amplifier stations spaced along the seabed route.",
        "The pottery kiln reached temperature slowly as the glaze "
        "chemistry demanded a precise reduction atmosphere inside.",
        "Migratory shorebirds time their departure with the tidal "
        "cycles that expose the mudflats rich in invertebrates.",
    ]
    rows = [
        (f"d{i}",
         f"{uniq[i]}\n{shared}.\n"
         f"A closing sentence number {i} finishes the page properly.")
        for i in range(4)
    ]
    docs = spark.createDataFrame(
        [(k, [{"kind": "text", "text": t, "media_ref": None,
               "offset": 0}]) for k, t in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    urls = spark.createDataFrame(
        [(f"d{i}", f"https://one.example/p{i}") for i in range(4)],
        "doc_id string, url string",
    )
    inp, uinp, out = (str(tmp_path / p) for p in ("in", "urls", "out"))
    docs.write.parquet(inp)
    urls.write.parquet(uinp)

    report = main(
        ["--input", inp, "--output", out, "--no-gopher", "--no-c4",
         "--substring-dedup", "--substring-min-len", "60",
         "--url-input", uinp, "--max-per-host", "3",
         "--master", "local[4]"],
        stop=False,
    )
    funnel = report["funnel"]
    assert funnel["after_substring_dedup"] == 4
    assert funnel["after_host_cap"] == 3  # d3 capped out
    final = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(out + "/data").collect()
    }
    assert set(final) == {"d0", "d1", "d2"}
    assert all(shared not in t for t in final.values())
    stats = spark.read.parquet(out + "/_audit/host_stats").collect()
    assert stats and stats[0]["host"] == "one.example"
    assert json.load(open(out + "/_audit/funnel.json"))["funnel"] == funnel


def test_curate_job_decontam_branch(spark, tmp_path):
    """--decontam-input drops the doc that leaks a benchmark 13-gram
    and writes the contamination audit table."""
    import json

    from jobs.curate_job import main

    leak = ("the quick brown fox jumps over the lazy dog near the "
            "quiet river bank")  # 14 words -> contains 13-grams
    rows = [
        ("dirty", f"Opening sentence pads this document nicely today.\n"
                  f"{leak}.\nA closing sentence finishes the page."),
        ("clean", "Submarine cables carry optical signals across the "
                  "atlantic with amplifier stations spaced along the "
                  "seabed route today.\nA second sentence pads this "
                  "document further now."),
    ]
    docs = spark.createDataFrame(
        [(k, [{"kind": "text", "text": t, "media_ref": None,
               "offset": 0}]) for k, t in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    bench = spark.createDataFrame(
        [(f"Q: {leak}?",)], "text string"
    )
    inp, binp, out = (str(tmp_path / p) for p in ("in", "bench", "out"))
    docs.write.parquet(inp)
    bench.write.parquet(binp)

    report = main(
        ["--input", inp, "--output", out, "--no-gopher", "--no-c4",
         "--decontam-input", binp, "--master", "local[4]"],
        stop=False,
    )
    funnel = report["funnel"]
    assert funnel["after_decontam"] == 1
    kept = {r["doc_id"] for r in spark.read.parquet(out + "/data").collect()}
    assert kept == {"clean"}
    audit = spark.read.parquet(out + "/_audit/contamination").collect()
    assert [r["doc_id"] for r in audit] == ["dirty"] and audit[0]["hits"] >= 1
    assert json.load(open(out + "/_audit/funnel.json"))["funnel"] == funnel
