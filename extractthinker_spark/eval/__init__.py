from extractthinker_spark.eval.field_compare import (
    exact_match,
    fuzzy_match,
    fuzzy_ratio,
    numeric_match,
)
from extractthinker_spark.eval.hallucination import (
    doc_hallucination,
    hallucination_score,
)
from extractthinker_spark.eval.metrics import (
    document_accuracy,
    field_metrics,
    schema_validity,
)

__all__ = [
    "exact_match",
    "fuzzy_match",
    "fuzzy_ratio",
    "numeric_match",
    "field_metrics",
    "document_accuracy",
    "schema_validity",
    "doc_hallucination",
    "hallucination_score",
]
