"""Canonical schemas for the interleaved-document corpus.

Authoritative input shape (BASELINE.json input_hint):

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

``kind`` ∈ {text, html, pdf_text, table, media}. ``media_ref`` is
non-null only for media spans. ``offset`` is the 0-based position of
the span within the document and is the ONLY source of span order —
never partition order (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SPAN_STRUCT = StructType(
    [
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("spans", ArrayType(SPAN_STRUCT), False),
    ]
)

# Flat (exploded) span rows — the working shape for most operators;
# cheap to re-nest with collect_list(sort_array(...)).
FLAT_SPAN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("kind", StringType(), True),
        StructField("text", StringType(), True),
        StructField("media_ref", StringType(), True),
        StructField("offset", IntegerType(), True),
    ]
)

SPAN_KINDS = ("text", "html", "pdf_text", "table", "media")

# Page header convention inside pdf_text spans (FIXTURES.md §1): each
# page span's text begins with "\fPAGE {k}\n" (form-feed page separator,
# mirroring the reference's doc2txt page_separator semantics —
# /root/reference/extract_thinker/document_loader/document_loader_doc2txt.py:125-127).
PAGE_HEADER_PREFIX = "\fPAGE "
