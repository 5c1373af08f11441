"""Eval CLI — ``python -m extractthinker_spark.eval --config cfg.json``.

Runnable rebuild of the reference's evaluation entry point
(/root/reference/extract_thinker/eval/cli.py:1-151): a JSON config
names a documents directory, a labels file and a contract; the CLI
runs the deterministic extraction pipeline over the dataset, computes
field/document metrics (plus optional hallucination scoring), prints
the markdown summary and saves the JSON report
(Evaluator.save_report, evaluator.py:415-425).

Config keys (reference cli.py:95-142 shape, LLM/extractor plumbing
replaced by the rule registry):

    documents_dir        directory scanned with binaryFile
    labels_path          JSON labels {doc_id: {field: expected}}
    contract             name in contracts.CONTRACT_FIELDS (e.g.
                         "Invoice"); omit to rule-classify per doc
    evaluation_name      report title  (default "Extraction Evaluation")
    file_pattern         glob          (default "*.*")
    detect_hallucinations  bool        (default false; CLI flag ORs in)

The pipeline is the library's own surface end to end: binaryFile scan
→ raw-bytes sniff/decode → boilerplate strip → (optional) rule
classification → regex contract extraction → long-format eval join →
one-shuffle metric aggregations.
"""

from __future__ import annotations

import argparse
import json

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def run_eval(spark: SparkSession, config: dict) -> dict:
    """Execute the eval pipeline for a config dict; returns the report
    dict (build_report shape)."""
    from extractthinker_spark.contracts import CONTRACT_FIELDS
    from extractthinker_spark.eval.dataset import filesystem_dataset
    from extractthinker_spark.eval.hallucination import doc_hallucination
    from extractthinker_spark.eval.metrics import (
        document_accuracy,
        field_metrics,
    )
    from extractthinker_spark.eval.report import build_report
    from extractthinker_spark.operators.classify import classify_keyword
    from extractthinker_spark.operators.extract import extract_fields
    from extractthinker_spark.operators.rawbytes import parse_raw_bytes
    from extractthinker_spark.plans.pipeline import (
        doc_text,
        extract_main_content,
    )

    docs, labels = filesystem_dataset(
        spark,
        config["documents_dir"],
        config["labels_path"],
        config.get("file_pattern", "*.*"),
    )
    spans = parse_raw_bytes(docs)
    texts = doc_text(extract_main_content(spans))
    contract = config.get("contract")
    if contract is not None:
        if contract not in CONTRACT_FIELDS:
            raise ValueError(
                f"unknown contract {contract!r}; known: "
                + ", ".join(sorted(CONTRACT_FIELDS))
            )
        classified = texts.withColumn("classification", F.lit(contract))
    else:
        res = classify_keyword(F.col("content"))
        classified = texts.withColumn("classification", res["name"])
    preds = extract_fields(classified).select(
        "doc_id", "field", F.col("value").alias("predicted")
    )
    joined = labels.join(preds, ["doc_id", "field"], "left")

    hall_df: DataFrame | None = None
    if config.get("detect_hallucinations"):
        hall_df = doc_hallucination(
            preds.join(texts, "doc_id").select(
                "doc_id",
                F.col("predicted").alias("value"),
                F.col("content").alias("doc_text"),
            )
        )
    return build_report(
        config.get("evaluation_name", "Extraction Evaluation"),
        field_metrics(joined),
        document_accuracy(joined),
        hall_df,
    )


def main(argv: list[str] | None = None) -> int:
    from extractthinker_spark.eval.report import (
        report_to_markdown,
        save_report,
    )
    from extractthinker_spark.session import get_spark

    parser = argparse.ArgumentParser(
        description="Evaluate extraction performance (deterministic "
        "rule pipeline; reference eval/cli.py surface)"
    )
    parser.add_argument("--config", required=True,
                        help="Path to evaluation configuration JSON")
    parser.add_argument("--output", default="eval_results.json",
                        help="Path to save the JSON report")
    parser.add_argument("--markdown", default=None,
                        help="Optional path for a markdown rendering")
    parser.add_argument("--detect-hallucinations", action="store_true",
                        help="Enable hallucination scoring")
    parser.add_argument("--master", default="local[4]",
                        help="Spark master (default local[4])")
    args = parser.parse_args(argv)

    with open(args.config) as f:
        config = json.load(f)
    if args.detect_hallucinations:
        config["detect_hallucinations"] = True

    spark = get_spark("extractthinker-eval", master=args.master)
    try:
        report = run_eval(spark, config)
    finally:
        spark.stop()

    print(report_to_markdown(report))
    save_report(report, args.output)
    if args.markdown:
        with open(args.markdown, "w") as f:
            f.write(report_to_markdown(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
