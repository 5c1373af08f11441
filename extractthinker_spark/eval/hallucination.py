"""Heuristic hallucination scoring — pure Catalyst expressions.

Deterministic rebuild of the reference's HEURISTIC strategy
(/root/reference/extract_thinker/eval/hallucination.py:142-187): a
field value is scored against the source document text —

    0.0  value appears verbatim (case-insensitive substring)
    0.3  every word of the value appears somewhere in the text
    0.6  some 4-gram of the value appears in the text
    0.9  no significant match — considered hallucinated

and the document-level score is the fraction of fields whose score
meets the contradiction threshold (default 0.7) — hallucination.py:69-97.

The 4-gram probe is a fold over ``sequence(1, len-3)`` — O(len(value))
substring checks, all JVM-side; field values are short (extracted
scalars), so this stays cheap even on 100 KB documents because the
``contains`` scan is over the doc text once per 4-gram of the VALUE,
not per 4-gram of the document.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_THRESHOLD = 0.7


def hallucination_score(value: Column, doc_text: Column) -> Column:
    """Per-field score in {0.0, 0.3, 0.6, 0.9}; NULL for NULL values
    (the reference skips None fields, hallucination.py:99-109).

    Both lowered operands are LET-bound once (transform-over-array
    trick, NOTES.md): referenced directly inside the per-position
    lambdas, ``lower(doc_text)`` would be re-inlined and recomputed
    over the whole document at every n-gram probe."""

    def score_with(s: Column) -> Column:
        v, d = s["v"], s["d"]
        words = F.regexp_extract_all(v, F.lit(r"\w+"), F.lit(0))
        all_words = (F.size(words) > 0) & F.forall(
            words, lambda w: d.contains(w)
        )
        ngram_hit = F.when(
            F.length(v) > 3,
            F.exists(
                F.sequence(F.lit(1), F.length(v) - 3),
                lambda i: d.contains(F.substring(v, i, 4)),
            ),
        ).otherwise(F.lit(False))
        return (
            F.when(d.contains(v), 0.0)
            .when(all_words, 0.3)
            .when(ngram_hit, 0.6)
            .otherwise(0.9)
        )

    scored = F.transform(
        F.array(
            F.struct(
                F.lower(F.trim(value.cast("string"))).alias("v"),
                F.lower(doc_text).alias("d"),
            )
        ),
        score_with,
    )[0]
    return F.when(
        value.isNull(), F.lit(None).cast("double")
    ).otherwise(scored)


def doc_hallucination(
    fields: DataFrame,
    doc_col: str = "doc_id",
    value_col: str = "value",
    text_col: str = "doc_text",
    threshold: float = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Document-level overall score = contradicted_fields / total_fields
    over the long (doc_id, field, value, doc_text) shape; NULL-valued
    fields are skipped entirely (reference semantics)."""
    scored = fields.withColumn(
        "h_score", hallucination_score(F.col(value_col), F.col(text_col))
    ).filter(F.col("h_score").isNotNull())
    return scored.groupBy(doc_col).agg(
        F.count("*").alias("n_fields"),
        F.sum((F.col("h_score") >= threshold).cast("int")).alias("n_contradicted"),
        F.round(
            F.avg((F.col("h_score") >= threshold).cast("double")), 6
        ).alias("overall_score"),
    )
