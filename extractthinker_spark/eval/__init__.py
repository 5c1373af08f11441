from extractthinker_spark.eval.comparative import (
    build_comparative_report,
    comparative_document_accuracy,
    comparative_field_metrics,
    comparative_report_to_markdown,
    join_predictions,
)
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
    "build_comparative_report",
    "comparative_document_accuracy",
    "comparative_field_metrics",
    "comparative_report_to_markdown",
    "join_predictions",
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
