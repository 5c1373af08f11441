"""Eval report assembly — the driver-side summary of the eval DFs.

Deterministic rebuild of the reference's report generation
(/root/reference/extract_thinker/eval/report.py:1-153: metrics dict →
console/HTML). The aggregation DataFrames are tiny by construction
(one row per field / one summary row), so collecting them on the
driver is safe at any corpus scale — the heavy lifting stayed
distributed in eval/metrics.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def build_report(
    evaluation_name: str,
    field_metrics_df: DataFrame,
    doc_accuracy_df: DataFrame | None = None,
    hallucination_df: DataFrame | None = None,
) -> dict:
    """Collect the eval aggregates into the reference's report shape:
    {evaluation_name, field_metrics: {field: {...}}, documents: {...},
    hallucination: {...}}."""
    report: dict = {
        "evaluation_name": evaluation_name,
        "field_metrics": {
            r["field"]: {
                "precision": r["precision"],
                "recall": r["recall"],
                "f1": r["f1"],
                "accuracy": r["accuracy"],
                "tp": r["tp"], "fp": r["fp"], "fn": r["fn"],
                "total": r["total"],
            }
            for r in field_metrics_df.collect()
        },
    }
    if doc_accuracy_df is not None:
        row = doc_accuracy_df.collect()[0]
        report["documents"] = {
            "n_docs": row["n_docs"],
            "n_correct_docs": row["n_correct_docs"],
            "doc_accuracy": row["doc_accuracy"],
        }
    if hallucination_df is not None:
        rows = hallucination_df.collect()
        n = sum(r["n_fields"] for r in rows)
        c = sum(r["n_contradicted"] for r in rows)
        report["hallucination"] = {
            "n_docs_scored": len(rows),
            "n_fields": n,
            "n_contradicted": c,
            "contradiction_rate": round(c / n, 6) if n else 0.0,
        }
    return report


def save_report(report: dict, output_path: str) -> None:
    """Write the report dict as indented JSON
    (Evaluator.save_report, evaluator.py:415-425 — the pydantic
    ``report.json(indent=2)`` dump collapsed to a plain dict dump)."""
    import json

    with open(output_path, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(f"Report saved to: {output_path}")


def report_to_markdown(report: dict) -> str:
    """Render the report dict as a markdown document (the reference's
    console/HTML renderers collapsed into one deterministic format)."""
    lines = [f"# Evaluation: {report['evaluation_name']}", ""]
    fm = report.get("field_metrics", {})
    if fm:
        lines += [
            "## Field metrics", "",
            "| field | precision | recall | f1 | accuracy | tp | fp | fn |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for field in sorted(fm):
            m = fm[field]
            lines.append(
                f"| {field} | {m['precision']} | {m['recall']} | {m['f1']} "
                f"| {m['accuracy']} | {m['tp']} | {m['fp']} | {m['fn']} |"
            )
        lines.append("")
    if "documents" in report:
        d = report["documents"]
        lines += [
            "## Documents", "",
            f"- documents evaluated: {d['n_docs']}",
            f"- fully correct: {d['n_correct_docs']}",
            f"- document accuracy: {d['doc_accuracy']}", "",
        ]
    if "hallucination" in report:
        h = report["hallucination"]
        lines += [
            "## Hallucination", "",
            f"- fields scored: {h['n_fields']}",
            f"- contradicted: {h['n_contradicted']}",
            f"- contradiction rate: {h['contradiction_rate']}", "",
        ]
    return "\n".join(lines)
