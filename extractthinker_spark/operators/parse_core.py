"""Span-level parse operators — pure Spark SQL (JVM, codegen'd).

Everything here is a Column expression or a DataFrame transform built
from pyspark.sql.functions only: no Python in the hot path. These are
the Spark-first equivalents of the reference's loader post-processing:

  * page-header strip / page-number extraction — the doc2txt
    page-separator convention (document_loader_doc2txt.py:125-127).
  * interleaved media-marker replacement ``![id](id)`` →
    ``[Image content: id]`` — the Mistral-OCR inline replacement
    (document_loader_mistral_ocr.py:629-641).
  * format detection from span kind / content prefix — the loader
    dispatch + ``is_pdf_stream`` magic check
    (extractor.py:92-126, utils.py:48-84).
  * paragraph split ``\\n\\n`` → posexplode — the txt loader
    (document_loader_txt.py:119).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from extractthinker_spark.schemas import PAGE_HEADER_PREFIX

# ``![alt](target)`` marker, replaced with the alt id (group 1).
MEDIA_MARKER_RE = r"!\[([^\]]*)\]\(([^)]*)\)"
PAGE_HEADER_RE = r"^\fPAGE (\d+)\n"
SHEET_HEADER_RE = r"^\fSHEET ([^\n]*)\n"


def replace_media_markers(text: Column) -> Column:
    """Inline ``![id](id)`` → ``[Image content: id]``, order-preserving."""
    return F.regexp_replace(text, MEDIA_MARKER_RE, r"[Image content: $1]")


def strip_page_header(text: Column) -> Column:
    return F.regexp_replace(text, PAGE_HEADER_RE, "")


def page_number(text: Column) -> Column:
    """1-based page number from the ``\\fPAGE k\\n`` header, NULL if absent."""
    n = F.regexp_extract(text, PAGE_HEADER_RE, 1)
    return F.when(n != "", n.cast("int"))


def strip_sheet_header(text: Column) -> Column:
    """Drop the ``\\fSHEET name\\n`` header from spreadsheet-sheet spans
    (the sheet-name twin of the page header; reference keeps the name
    OUTSIDE the content, document_loader_spreadsheet.py:95-100)."""
    return F.regexp_replace(text, SHEET_HEADER_RE, "")


def sheet_name(text: Column) -> Column:
    """Sheet name from the ``\\fSHEET name\\n`` header, NULL if absent."""
    n = F.regexp_extract(text, SHEET_HEADER_RE, 1)
    return F.when(n != "", n)


# scheme + non-empty host — urlparse(scheme in http/https, netloc)
# semantics of the reference's URL predicate (document_loader.py:335-341)
URL_RE = r"^(?i)https?://[^\s/?#]+"


def is_url(source: Column) -> Column:
    """True when the source string is an http(s) URL."""
    return source.rlike(URL_RE)


def detect_format(kind: Column, text: Column) -> Column:
    """Route spans to a parse branch. Mirrors loader dispatch: explicit
    kind wins; otherwise sniff content (magic-prefix checks)."""
    return (
        F.when(kind.isin("html", "pdf_text", "media", "table"), kind)
        .when(text.isNull(), F.lit("empty"))
        .when(F.lower(F.ltrim(text)).startswith("<!doctype html"), F.lit("html"))
        .when(F.lower(F.ltrim(text)).startswith("<html"), F.lit("html"))
        .when(text.startswith("%PDF-"), F.lit("pdf_text"))
        .when(text.startswith(PAGE_HEADER_PREFIX), F.lit("pdf_text"))
        .otherwise(F.lit("text"))
    )


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans[]) → flat span rows, order kept in ``offset``.

    Uses explode_outer so zero-span documents survive (as a single
    all-null span row, filtered back out at nest time) — silently
    dropping rows is not acceptable at corpus scale."""
    return documents.select(
        "doc_id", F.explode_outer("spans").alias("span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def nest_spans(flat: DataFrame, order_col: str = "offset") -> DataFrame:
    """Inverse of explode_spans. Span order is restored from the data
    (sort_array on the leading ``offset`` struct field), never from
    partition order — the shuffle-safety rule of SURVEY.md §7.4."""
    nested = (
        flat.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(order_col).cast("int").alias("_ord"),
                        "kind", "text", "media_ref",
                    )
                )
            ).alias("_sorted")
        )
        .select(
            "doc_id",
            F.transform(
                # placeholder rows from explode_outer (empty docs) have a
                # NULL sort key; drop them so empty docs nest to [].
                F.filter("_sorted", lambda s: s["_ord"].isNotNull()),
                lambda s, i: F.struct(
                    s["kind"].alias("kind"),
                    s["text"].alias("text"),
                    s["media_ref"].alias("media_ref"),
                    i.cast("int").alias("offset"),
                ),
            ).alias("spans"),
        )
    )
    return nested


def drop_media_spans(spans: Column) -> Column:
    """Image-removal projection (extractor.py:163-191): drop media
    spans and blank media_refs, preserving order and re-sequencing
    offsets — the vision-off content view. Pure array expressions."""
    kept = F.filter(spans, lambda s: s["kind"] != "media")
    return F.transform(
        kept,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )


def remove_table_lines(text: Column, tables: Column, cell_sep: str = " | ") -> Column:
    """Subtract table-duplicated lines from body text.

    The Azure DI loader builds tables separately and removes lines that
    already appear inside a table from the page text (document_loader_
    azure_document_intelligence.py, remove_lines_present_in_tables).
    Here: a body line is dropped iff its trimmed text equals some table
    row rendered as cells joined with ``cell_sep``. Pure Catalyst —
    order-preserving filter, no shuffle, no Python.

    ``tables``: array<array<array<string>>> (tables → rows → cells).
    """
    row_strings = F.coalesce(
        F.flatten(
            F.transform(
                tables,
                lambda t: F.transform(t, lambda r: F.array_join(r, cell_sep)),
            )
        ),
        F.array().cast("array<string>"),  # NULL tables = nothing to subtract
    )
    kept = F.filter(
        F.split(text, "\n"),
        lambda line: ~F.array_contains(row_strings, F.trim(line)),
    )
    return F.array_join(kept, "\n")


# Fenced ```json blocks take precedence over a bare {...} object —
# the reference's extraction order (utils.py:479-540).
JSON_FENCE_RE = r"```(?:json)?\s*(\{[\s\S]*?\})\s*```"
# Bare candidate = first '{' through the FIRST '}' (non-greedy across
# newlines), exactly the reference's re.search(r'\{.*?\}', DOTALL)
# (utils.py:200-214). For nested unfenced JSON this candidate is
# unbalanced, json.loads fails, and the reference returns None —
# from_json's PERMISSIVE null reproduces that, instead of the previous
# [^{}] regex which silently grabbed the wrong (innermost) object.
JSON_BARE_RE = r"(?s)(\{.*?\})"


def extract_json_str(text: Column) -> Column:
    """Raw JSON candidate embedded in free text (fenced block
    preferred), NULL when none — the reference's match.group()
    (utils.py:200-214/:479-540). May be unparseable (unbalanced) for
    nested bare objects; parse_json_fields turns that into NULL, the
    loads-or-None step.

    Both regex extractions are let-bound (evaluated ONCE) before the
    when-chain: a CASE branch references its value in the condition
    AND the result, and conditional-branch CSE does not deduplicate
    them — the fence regex (the expensive one: lazy body match) ran
    twice per row, measured ~1.6x the whole extraction."""
    fenced = F.regexp_extract(text, JSON_FENCE_RE, 1)
    bare = F.regexp_extract(text, JSON_BARE_RE, 1)
    return F.transform(
        F.array(F.struct(fenced.alias("f"), bare.alias("b"))),
        lambda s: F.when(s["f"] != "", s["f"]).when(s["b"] != "", s["b"]),
    )[0]


def parse_json_fields(text: Column, schema: str) -> Column:
    """Extract + parse: struct column per ``schema`` (from_json,
    PERMISSIVE → NULL struct for invalid candidates, matching the
    reference's json.loads-failure → None)."""
    return F.from_json(extract_json_str(text), schema)


# ---------------------------------------------------------------------------
# CONCATENATE completion strategy: multi-part JSON stitching.
# ---------------------------------------------------------------------------

def is_json_continuation(part: Column) -> Column:
    """The reference's continuation gate (concatenation_handler.py:
    14-27): a part counts as JSON-bearing iff it contains ```json, '{'
    or '['."""
    return (
        part.contains("```json") | part.contains("{") | part.contains("[")
    )


def clean_json_part(part: Column) -> Column:
    """Per-part cleanup, exactly the reference's replace chain
    (concatenation_handler.py:66-76): drop ```json fences, stray
    ``` and '\\njson' artifacts, newlines → spaces, trim."""
    s = F.replace(part, F.lit("```json"), F.lit(""))
    s = F.replace(s, F.lit("```"), F.lit(""))
    s = F.replace(s, F.lit("\njson"), F.lit(""))
    s = F.replace(s, F.lit("\n"), F.lit(" "))
    return F.trim(s)


def concatenate_parts(
    df: DataFrame,
    keys: list[str],
    part_col: str = "part",
    order_col: str = "part_no",
    schema: str | None = None,
) -> DataFrame:
    """CONCATENATE strategy (concatenation_handler.py:30-97) as one
    aggregation: per document, keep JSON-bearing parts, clean each,
    join in part order with '' and parse once.

    The reference accumulates parts across LLM continuation calls; a
    deterministic engine has all parts up front, so the retry loop
    collapses into filter → sort → join → from_json (NULL ``parsed``
    is the json.loads-failure path). One shuffle on the keys.
    """
    cleaned = F.when(
        is_json_continuation(F.col(part_col)), clean_json_part(F.col(part_col))
    )
    per_doc = df.select(
        *keys, F.struct(F.col(order_col).alias("o"), cleaned.alias("c")).alias("e")
    ).groupBy(*keys).agg(
        F.array_join(
            F.filter(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["c"]
                ),
                lambda c: c.isNotNull() & (c != ""),
            ),
            "",
        ).alias("combined_json")
    )
    if schema is not None:
        per_doc = per_doc.withColumn(
            "parsed", F.from_json("combined_json", schema)
        )
    return per_doc


def split_paragraphs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """txt-loader semantics: one row per ``\\n\\n``-separated paragraph,
    position preserved (posexplode)."""
    return df.select(
        "*", F.posexplode(F.split(F.col(text_col), r"\n\n")).alias("para_no", "para")
    ).drop(text_col)
