"""The main-content extraction pipeline (the flagship job).

documents(doc_id, spans) → extracted(doc_id, spans) where each span is
transformed per kind (SURVEY.md §7.1 minimum slice, now full width):

    text      → media markers replaced inline (JVM regexp)
    html      → boilerplate-stripped main text (Arrow UDF), kind='text'
    pdf_text  → page header stripped (JVM regexp)
    media     → passthrough
    table     → passthrough

Only the html branch leaves the JVM; at web scale html is the minority
kind, and the branch predicate pushes the UDF onto exactly those rows.
Offsets are re-sequenced 0..n-1 per document from the data itself.

Scale notes (100 TB): the pipeline is embarrassingly parallel per
document — no join, a single groupBy(doc_id) shuffle at re-nest time.
Use ``skew.salt_repartition`` before calling when the input has
mega-docs, or keep the output flat (``nest=False``) and avoid the
shuffle entirely when the consumer is span-oriented.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from extractthinker_spark.operators.parse_core import (
    explode_spans,
    nest_spans,
    replace_media_markers,
    strip_page_header,
    strip_sheet_header,
)
from extractthinker_spark.operators.parse_html import strip_html_udf


def extract_spans_flat(documents: DataFrame) -> DataFrame:
    """Flat span rows with the per-kind transform applied."""
    flat = explode_spans(documents)
    out_kind = (
        F.when(F.col("kind") == "html", F.lit("text"))
        .otherwise(F.col("kind"))
    )
    # A pandas UDF inside a CASE WHEN is hoisted into an ArrowEvalPython
    # node that evaluates on EVERY row, so non-html spans (the majority,
    # including mega pdf texts) would round-trip through Arrow and
    # Python for nothing. Masking the input to NULL for non-html rows
    # keeps the single-pass plan while the Python side skips NULLs
    # (na_action='ignore') — measured 2x end-to-end on a corpus with
    # 25% html spans.
    html_in = F.when(F.col("kind") == "html", F.col("text"))
    out_text = (
        F.when(F.col("kind") == "html", strip_html_udf(html_in))
        .when(F.col("kind") == "pdf_text", strip_page_header(F.col("text")))
        .when(F.col("kind") == "text", replace_media_markers(F.col("text")))
        .when(F.col("kind") == "table", strip_sheet_header(F.col("text")))
        .otherwise(F.col("text"))
    )
    return flat.select(
        "doc_id",
        out_kind.alias("kind"),
        out_text.alias("text"),
        "media_ref",
        "offset",
    )


def extract_main_content(documents: DataFrame, nest: bool = True) -> DataFrame:
    """The end-to-end pipeline. ``nest=False`` skips the re-nest shuffle."""
    flat = extract_spans_flat(documents)
    if not nest:
        return flat
    return nest_spans(flat)


def doc_text(documents: DataFrame) -> DataFrame:
    """Document-level merged text: span texts joined with ``\\n\\n``
    (the reference's page-join convention, extractor.py:270-283),
    computed WITHOUT a shuffle — pure array expressions over the
    nested column."""
    texts = F.filter(
        F.transform(
            F.array_sort(
                F.col("spans"),
                lambda a, b: F.when(a["offset"] < b["offset"], -1)
                .when(a["offset"] > b["offset"], 1)
                .otherwise(0),
            ),
            lambda s: s["text"],
        ),
        lambda t: t.isNotNull(),
    )
    return documents.select(
        "doc_id",
        F.array_join(texts, "\n\n").alias("content"),
        F.size("spans").alias("num_spans"),
    )
