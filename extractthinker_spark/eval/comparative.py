"""Teacher–student comparative evaluation — two predictors, one pass.

Spark-native rebuild of the reference's TeacherStudentEvaluator
(/root/reference/extract_thinker/eval/evaluator.py:427-780): a
"student" extractor is benchmarked against a superior "teacher" over
the same labeled dataset, producing per-field F1 for both sides plus
an improvement percentage, and document-level accuracy for both sides
(``_generate_comparative_report``, evaluator.py:714-780).

Spark shape: instead of the reference's per-document loop running two
extractors serially, both prediction sets arrive as long DataFrames
(doc_id, field, predicted) — e.g. two rule-contract pipelines or two
parse configurations — and every counter for BOTH sides is computed in
ONE map-side-combinable aggregation over the joined long table: a
single tiny shuffle on the low-cardinality ``field`` key regardless of
corpus size.

Improvement-percentage semantics follow evaluator.py:739-744 exactly:
(teacher_f1 - student_f1) / student_f1 * 100 when student_f1 > 0,
+Infinity when the student scored 0 and the teacher didn't, 0.0 when
both scored 0.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from extractthinker_spark.eval.field_compare import exact_match


def join_predictions(
    labels: DataFrame,
    student: DataFrame,
    teacher: DataFrame,
    doc_col: str = "doc_id",
    field_col: str = "field",
    predicted_col: str = "predicted",
) -> DataFrame:
    """labels (doc_id, field, expected) LEFT JOINed with each
    predictor's long output → (doc_id, field, expected, student,
    teacher). Missing predictions stay NULL (counted as FN, the
    reference's field-missing branch, evaluator.py:683-686)."""
    s = student.select(
        F.col(doc_col).alias(doc_col),
        F.col(field_col).alias(field_col),
        F.col(predicted_col).alias("student"),
    )
    t = teacher.select(
        F.col(doc_col).alias(doc_col),
        F.col(field_col).alias(field_col),
        F.col(predicted_col).alias("teacher"),
    )
    return labels.join(s, [doc_col, field_col], "left").join(
        t, [doc_col, field_col], "left"
    )


def _side_flags(correct: Column, predicted: Column) -> tuple[Column, ...]:
    present = predicted.isNotNull() & (F.trim(predicted.cast("string")) != "")
    return (
        correct.cast("int"),
        (~correct & present).cast("int"),
        (~correct & ~present).cast("int"),
    )


def _prf(tp: Column, fp: Column, fn: Column) -> tuple[Column, Column, Column]:
    prec = F.when(tp + fp > 0, tp / (tp + fp)).otherwise(0.0)
    rec = F.when(tp + fn > 0, tp / (tp + fn)).otherwise(0.0)
    f1 = F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0)
    return prec, rec, f1


def comparative_field_metrics(
    joined: DataFrame,
    student_correct: Column | None = None,
    teacher_correct: Column | None = None,
    field_col: str = "field",
    expected_col: str = "expected",
) -> DataFrame:
    """Per-field comparative metrics: one row per field with
    (s_tp, s_fp, s_fn, s_precision, s_recall, s_f1) and the teacher
    twins plus ``improvement_pct`` — the FieldMetrics-pair +
    ``field_improvements`` table of the reference report
    (evaluator.py:735-750) in one aggregation pass.

    Comparison defaults to exact match per side; pass any Column
    (fuzzy/numeric/per-field CASE) to override either side.
    """
    exp = F.col(expected_col)
    if student_correct is None:
        student_correct = exact_match(exp, F.col("student"))
    if teacher_correct is None:
        teacher_correct = exact_match(exp, F.col("teacher"))
    s_tp, s_fp, s_fn = _side_flags(student_correct, F.col("student"))
    t_tp, t_fp, t_fn = _side_flags(teacher_correct, F.col("teacher"))
    agg = joined.select(
        F.col(field_col).alias("field"),
        s_tp.alias("s_tp"), s_fp.alias("s_fp"), s_fn.alias("s_fn"),
        t_tp.alias("t_tp"), t_fp.alias("t_fp"), t_fn.alias("t_fn"),
    ).groupBy("field").agg(
        F.sum("s_tp").alias("s_tp"),
        F.sum("s_fp").alias("s_fp"),
        F.sum("s_fn").alias("s_fn"),
        F.sum("t_tp").alias("t_tp"),
        F.sum("t_fp").alias("t_fp"),
        F.sum("t_fn").alias("t_fn"),
        F.count("*").alias("total"),
    )
    s_prec, s_rec, s_f1 = _prf(F.col("s_tp"), F.col("s_fp"), F.col("s_fn"))
    t_prec, t_rec, t_f1 = _prf(F.col("t_tp"), F.col("t_fp"), F.col("t_fn"))
    # round BEFORE the improvement division so both engines of a
    # value-level oracle divide bit-identical inputs
    s_f1r = F.round(s_f1, 6)
    t_f1r = F.round(t_f1, 6)
    improvement = (
        F.when(s_f1r > 0, F.round((t_f1r - s_f1r) / s_f1r * 100, 6))
        .when(t_f1r > 0, F.lit(float("inf")))
        .otherwise(0.0)
    )
    return agg.select(
        "field", "total",
        "s_tp", "s_fp", "s_fn",
        F.round(s_prec, 6).alias("s_precision"),
        F.round(s_rec, 6).alias("s_recall"),
        s_f1r.alias("s_f1"),
        "t_tp", "t_fp", "t_fn",
        F.round(t_prec, 6).alias("t_precision"),
        F.round(t_rec, 6).alias("t_recall"),
        t_f1r.alias("t_f1"),
        improvement.alias("improvement_pct"),
    )


def comparative_document_accuracy(
    joined: DataFrame,
    student_correct: Column | None = None,
    teacher_correct: Column | None = None,
    doc_col: str = "doc_id",
    expected_col: str = "expected",
) -> DataFrame:
    """One row: n_docs, student/teacher document accuracy (every field
    of the doc correct) and the reference's accuracy-improvement
    percentage (evaluator.py:753-759)."""
    exp = F.col(expected_col)
    if student_correct is None:
        student_correct = exact_match(exp, F.col("student"))
    if teacher_correct is None:
        teacher_correct = exact_match(exp, F.col("teacher"))
    per_doc = joined.groupBy(doc_col).agg(
        F.min(student_correct.cast("int")).alias("s_ok"),
        F.min(teacher_correct.cast("int")).alias("t_ok"),
    )
    s_acc = F.round(F.avg("s_ok"), 6)
    t_acc = F.round(F.avg("t_ok"), 6)
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("s_ok").alias("student_correct_docs"),
        F.sum("t_ok").alias("teacher_correct_docs"),
        s_acc.alias("student_doc_accuracy"),
        t_acc.alias("teacher_doc_accuracy"),
    ).select(
        "*",
        F.when(
            F.col("student_doc_accuracy") > 0,
            F.round(
                (F.col("teacher_doc_accuracy") - F.col("student_doc_accuracy"))
                / F.col("student_doc_accuracy") * 100,
                6,
            ),
        )
        .when(F.col("teacher_doc_accuracy") > 0, F.lit(float("inf")))
        .otherwise(0.0)
        .alias("doc_accuracy_improvement"),
    )


def build_comparative_report(
    evaluation_name: str,
    field_df: DataFrame,
    doc_df: DataFrame | None = None,
    student_model: str = "student",
    teacher_model: str = "teacher",
    report_cap: int = 10_000,
) -> dict:
    """Collect the comparative aggregates into the reference's
    EvaluationReport shape (evaluator.py:761-780): metrics,
    field_improvements, field_metrics + teacher_field_metrics.

    The collect is one row per contract FIELD (already aggregated),
    so it is bounded by the schema, not the eval set; ``report_cap``
    makes that contract explicit — a frame wider than the cap (a
    per-document frame passed by mistake) raises instead of pulling
    an unbounded result onto the driver."""
    rows = field_df.limit(report_cap + 1).collect()
    if len(rows) > report_cap:
        raise ValueError(
            f"build_comparative_report collected more than {report_cap} "
            "field rows — this expects PER-FIELD aggregates "
            "(compare_field_metrics output), not per-document rows"
        )

    def side(prefix: str, r) -> dict:
        return {
            "precision": r[f"{prefix}_precision"],
            "recall": r[f"{prefix}_recall"],
            "f1": r[f"{prefix}_f1"],
            "tp": r[f"{prefix}_tp"],
            "fp": r[f"{prefix}_fp"],
            "fn": r[f"{prefix}_fn"],
            "total": r["total"],
        }

    report: dict = {
        "evaluation_name": evaluation_name,
        "model": f"Student: {student_model}, Teacher: {teacher_model}",
        "field_improvements": {
            r["field"]: {
                "student_f1": r["s_f1"],
                "teacher_f1": r["t_f1"],
                "improvement_pct": r["improvement_pct"],
            }
            for r in rows
        },
        "field_metrics": {r["field"]: side("s", r) for r in rows},
        "teacher_field_metrics": {r["field"]: side("t", r) for r in rows},
    }
    if doc_df is not None:
        d = doc_df.collect()[0]
        report["metrics"] = {
            "student_document_accuracy": d["student_doc_accuracy"],
            "teacher_document_accuracy": d["teacher_doc_accuracy"],
            "document_accuracy_improvement": d["doc_accuracy_improvement"],
            "documents_evaluated": d["n_docs"],
        }
    return report


def comparative_report_to_markdown(report: dict) -> str:
    """Markdown rendering of the comparative report — the reference's
    teacher-student console table (report.py + evaluator comparative
    fields) as one deterministic document."""
    lines = [f"# Teacher–student evaluation: {report['evaluation_name']}",
             "", f"Models — {report.get('model', '')}", ""]
    fi = report.get("field_improvements", {})
    if fi:
        lines += [
            "## Field improvements", "",
            "| field | student F1 | teacher F1 | improvement % |",
            "|---|---|---|---|",
        ]
        for field in sorted(fi):
            m = fi[field]
            lines.append(
                f"| {field} | {m['student_f1']} | {m['teacher_f1']} "
                f"| {m['improvement_pct']} |"
            )
        lines.append("")
    if "metrics" in report:
        m = report["metrics"]
        lines += [
            "## Documents", "",
            f"- documents evaluated: {m['documents_evaluated']}",
            f"- student document accuracy: {m['student_document_accuracy']}",
            f"- teacher document accuracy: {m['teacher_document_accuracy']}",
            f"- improvement: {m['document_accuracy_improvement']}%", "",
        ]
    return "\n".join(lines)
