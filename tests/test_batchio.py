"""Batch JSONL request/result file surface (batch_job.py:48-70/98-175)."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from extractthinker_spark.operators.batchio import (
    read_batch_results,
    write_batch_requests,
)


def test_batch_request_jsonl_shape(spark, tmp_path):
    df = spark.createDataFrame(
        [("d1", "hello world"), ("d2", "totals: 5")], "doc_id string, content string"
    )
    out = str(tmp_path / "requests")
    write_batch_requests(df, out, model="m1", max_tokens=123)
    lines = []
    for root, _, files in os.walk(out):
        for f in files:
            if f.endswith(".json"):
                with open(os.path.join(root, f)) as fh:
                    lines += [json.loads(ln) for ln in fh if ln.strip()]
    by_id = {l["custom_id"]: l for l in lines}
    assert set(by_id) == {"d1", "d2"}
    r = by_id["d1"]
    # the reference's exact request envelope
    assert r["method"] == "POST" and r["url"] == "/v1/chat/completions"
    assert r["body"]["model"] == "m1" and r["body"]["max_tokens"] == 123
    assert r["body"]["messages"] == [{"role": "user", "content": "hello world"}]


def test_batch_results_roundtrip(spark, tmp_path):
    # nested OpenAI-style results (what the reference polls for)
    nested = [
        {"custom_id": "d1",
         "response": {"body": {"choices": [
             {"message": {"content": '{"total": 5}'}}]}}},
        {"custom_id": "d2",
         "response": {"body": {"choices": [
             {"message": {"content": '{"total": 9}'}}]}}},
    ]
    p = tmp_path / "results.jsonl"
    p.write_text("\n".join(json.dumps(x) for x in nested))
    got = read_batch_results(spark, str(p), content_schema="total bigint")
    rows = {r["custom_id"]: r for r in got.collect()}
    assert rows["d1"]["parsed"]["total"] == 5
    assert rows["d2"]["parsed"]["total"] == 9

    # flat layout fallback
    flat = tmp_path / "flat.jsonl"
    flat.write_text(json.dumps({"custom_id": "x", "content": "plain"}))
    got2 = read_batch_results(spark, str(flat)).collect()
    assert got2[0]["custom_id"] == "x" and got2[0]["content"] == "plain"
