"""Extraction-eval aggregations — plain groupBy/agg, one shuffle each.

Deterministic rebuild of the reference's eval counters
(/root/reference/extract_thinker/eval/metrics.py):

  * field-level TP/FP/FN -> precision/recall/F1/accuracy per field
    (metrics.py:6-140). The update rule per (doc, field) observation:
      correct            -> TP
      incorrect, present -> FP
      incorrect, absent  -> FN
    with present = prediction non-null and non-empty.
  * document accuracy — all fields of a doc correct (metrics.py:143-175)
  * schema validity rate (metrics.py:178-212)

Input is the long eval join: one row per (doc_id, field) with
``expected``, ``predicted`` columns — the Spark shape of the
reference's per-document dict loop. At 100 TB this is a single
map-side-combinable aggregation on a low-cardinality key (field), so
the shuffle is tiny regardless of corpus size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from extractthinker_spark.eval.field_compare import exact_match


def _present(predicted: Column) -> Column:
    return predicted.isNotNull() & (F.trim(predicted.cast("string")) != "")


def field_metrics(
    joined: DataFrame,
    correct: Column | None = None,
    field_col: str = "field",
    expected_col: str = "expected",
    predicted_col: str = "predicted",
) -> DataFrame:
    """Per-field precision/recall/F1/accuracy.

    ``correct`` defaults to exact match; pass any comparison Column
    (fuzzy_match / numeric_match / a per-field CASE) to override —
    the reference's per-field FieldComparisonConfig registry maps to
    exactly such a CASE expression.
    """
    if correct is None:
        correct = exact_match(F.col(expected_col), F.col(predicted_col))
    present = _present(F.col(predicted_col))
    flags = joined.select(
        F.col(field_col).alias("field"),
        correct.cast("int").alias("tp"),
        (~correct & present).cast("int").alias("fp"),
        (~correct & ~present).cast("int").alias("fn"),
    )
    agg = flags.groupBy("field").agg(
        F.sum("tp").alias("tp"),
        F.sum("fp").alias("fp"),
        F.sum("fn").alias("fn"),
        F.count("*").alias("total"),
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0,
                  F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0)
    rec = F.when(F.col("tp") + F.col("fn") > 0,
                 F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0)
    return agg.select(
        "field", "tp", "fp", "fn", "total",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0), 6
        ).alias("f1"),
        F.round(
            F.when(F.col("total") > 0, F.col("tp") / F.col("total")).otherwise(0.0),
            6,
        ).alias("accuracy"),
    )


def document_accuracy(
    joined: DataFrame,
    correct: Column | None = None,
    doc_col: str = "doc_id",
    expected_col: str = "expected",
    predicted_col: str = "predicted",
) -> DataFrame:
    """(n_docs, n_correct_docs, doc_accuracy): a doc is correct iff
    every one of its fields is correct (metrics.py:158-165)."""
    if correct is None:
        correct = exact_match(F.col(expected_col), F.col(predicted_col))
    per_doc = joined.groupBy(doc_col).agg(
        F.min(correct.cast("int")).alias("all_correct")
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("all_correct").alias("n_correct_docs"),
        F.round(F.avg("all_correct"), 6).alias("doc_accuracy"),
    )


def schema_validity(df: DataFrame, valid: Column) -> DataFrame:
    """(n_valid, n_invalid, success_rate) over a boolean validity
    column (metrics.py:178-212)."""
    v = valid.cast("int")
    return df.agg(
        F.sum(v).alias("n_valid"),
        F.sum(1 - v).alias("n_invalid"),
        F.round(F.avg(v), 6).alias("success_rate"),
    )
