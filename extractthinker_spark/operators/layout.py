"""XY-cut recursive layout segmentation (north_star requirement).

Orders the text blocks of a PDF-like page into reading order by the
classic recursive XY-cut algorithm (Nagy & Seth, 1984): project block
bounding boxes onto an axis, split at whitespace valleys wider than
``min_gap``, recurse — horizontal (Y) cuts first, then vertical (X) —
until no valley remains, then emit blocks in (y0, x0) order.

The reference delegates layout to Docling's converter and only maps
element labels to markdown
(/root/reference/extract_thinker/document_loader/document_loader_docling.py:292-355);
the segmentation itself is rebuilt here from the published algorithm,
deterministic (fixed thresholds, no RNG), Arrow-batched (one UDF call
per ~2048 pages, never per-row Python).

Input shape: one row per page with
``blocks: array<struct<text:string, x0:double, y0:double, x1:double, y1:double>>``
in any order. Output: the permutation of block indices in reading
order (so callers can reorder any parallel field), plus helpers that
assemble the ordered page text into ``pdf_text`` spans.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_MIN_GAP = 0.5

BLOCK_SCHEMA = (
    "array<struct<text:string, x0:double, y0:double, x1:double, y1:double>>"
)


# -- pure-python core (unit-testable without Spark) ---------------------------


def _gap_groups(items, lo_key, hi_key, min_gap):
    """Split interval items into groups separated by gaps >= min_gap.

    items are (idx, box) pairs; returns a list of groups (each a list of
    pairs) ordered by coordinate, or None if no qualifying gap exists.
    """
    order = sorted(items, key=lambda p: (lo_key(p[1]), hi_key(p[1])))
    groups, current = [], [order[0]]
    reach = hi_key(order[0][1])
    for pair in order[1:]:
        lo = lo_key(pair[1])
        if lo - reach >= min_gap:
            groups.append(current)
            current = [pair]
        else:
            current.append(pair)
        reach = max(reach, hi_key(pair[1]))
    groups.append(current)
    return groups if len(groups) > 1 else None


def xy_cut_order(boxes, min_gap: float = DEFAULT_MIN_GAP) -> list[int]:
    """Reading-order permutation of ``boxes`` (list of (x0,y0,x1,y1))."""
    out: list[int] = []

    def rec(items):
        if len(items) == 1:
            out.append(items[0][0])
            return
        for lo, hi in (
            (lambda b: b[1], lambda b: b[3]),  # Y axis (horizontal cut)
            (lambda b: b[0], lambda b: b[2]),  # X axis (vertical cut)
        ):
            groups = _gap_groups(items, lo, hi, min_gap)
            if groups:
                for g in groups:
                    rec(g)
                return
        # Atomic region: row-major order.
        for idx, _ in sorted(items, key=lambda p: (p[1][1], p[1][0])):
            out.append(idx)

    items = list(enumerate(boxes))
    if items:
        rec(items)
    return out


# -- Spark surface ------------------------------------------------------------


def make_xy_cut_udf(min_gap: float = DEFAULT_MIN_GAP):
    """Permutation UDF over FOUR parallel coordinate arrays.

    Only the box coordinates cross the Python boundary (guide rule:
    pass the columns the function needs, nothing else). The previous
    form took the whole ``array<struct<text,x0,y0,x1,y1>>`` column, so
    every block's TEXT was serialized to Arrow, transposed into a
    python dict per element, and shipped back unused — measured ~4x
    the per-row cost of the recursion itself. array<double> columns
    arrive as numpy float64 arrays (the Arrow fast path); the
    coordinates are the same doubles, so the permutation is
    unchanged."""

    @F.pandas_udf("array<int>")
    def xy_cut_udf(
        x0s: pd.Series, y0s: pd.Series, x1s: pd.Series, y1s: pd.Series
    ) -> pd.Series:
        out = []
        for x0, y0, x1, y1 in zip(x0s, y0s, x1s, y1s):
            if x0 is None or len(x0) == 0:
                out.append([])
            else:
                out.append(
                    xy_cut_order(list(zip(x0, y0, x1, y1)), min_gap)
                )
        return pd.Series(out)

    # Plan barrier (guide §4.4 / NOTES r5): when the permutation feeds
    # a non-outer explode, InferFiltersFromGenerate adds a
    # size(..)>0 filter over the UDF output and pushes it below the
    # repartition — duplicating the ArrowEvalPython (the UDF ran TWICE,
    # the second copy on the unsplittable pre-shuffle scan) plus two
    # interpreted copies of the downstream transform inside the Filter.
    # Marking the (deterministic) UDF non-deterministic forbids the
    # duplication; one ArrowEvalPython remains.
    return xy_cut_udf.asNondeterministic()


def reading_order(blocks: Column, min_gap: float = DEFAULT_MIN_GAP) -> Column:
    """Column of block-index permutations in reading order."""
    return make_xy_cut_udf(min_gap)(
        F.transform(blocks, lambda b: b["x0"]),
        F.transform(blocks, lambda b: b["y0"]),
        F.transform(blocks, lambda b: b["x1"]),
        F.transform(blocks, lambda b: b["y1"]),
    )


def ordered_block_texts(
    blocks: Column, order: Column
) -> Column:
    """Reorder block texts by the XY-cut permutation — JVM-side."""
    return F.transform(order, lambda i: F.element_at(blocks, i + 1)["text"])


def segment_pages(
    pages: DataFrame,
    blocks_col: str = "blocks",
    min_gap: float = DEFAULT_MIN_GAP,
) -> DataFrame:
    """pages(..., blocks) → + reading_order:array<int>, page_text:string.

    The only Python step is the permutation (ints in, ints out — tiny
    Arrow payload); text reassembly stays JVM-side.
    """
    with_order = pages.withColumn(
        "reading_order", reading_order(F.col(blocks_col), min_gap)
    )
    return with_order.withColumn(
        "page_text",
        F.array_join(
            ordered_block_texts(F.col(blocks_col), F.col("reading_order")),
            "\n",
        ),
    )


# -- markdown assembly (Docling element-label mapping, S10) -------------------
# document_loader_docling.py:292-335 maps layout element labels to
# markdown: TITLE -> '# ', SECTION_HEADER -> '## ', CODE -> fenced,
# LIST_ITEM -> '- ', TABLE -> markdown table; everything else is a
# plain paragraph. Pure Catalyst expressions over labeled blocks.

LABELED_BLOCK_SCHEMA = "array<struct<label:string, text:string>>"


def labeled_blocks_to_markdown(blocks: Column) -> Column:
    """array<struct<label,text>> (already in reading order) → one
    markdown string, blocks separated by blank lines."""

    def one(b: Column) -> Column:
        label = F.lower(b["label"])
        t = b["text"]
        return (
            F.when(label == "title", F.concat(F.lit("# "), t))
            .when(label == "section_header", F.concat(F.lit("## "), t))
            .when(label == "list_item", F.concat(F.lit("- "), t))
            .when(label == "code", F.concat(F.lit("```\n"), t, F.lit("\n```")))
            .otherwise(t)
        )

    return F.array_join(F.transform(blocks, one), "\n\n")


def words_to_table(
    words: list[dict],
    x_tol: float = 10.0,
    y_tol: float = 10.0,
) -> list[list[str]]:
    """Table structure from word boxes — the pdfplumber
    ``vertical_strategy='text'`` / ``horizontal_strategy='text'``
    detection the reference's PDFPlumber loader relies on
    (document_loader_pdfplumber.py:138-177; settings ``x/y tolerance
    10``), re-derived from first principles:

      * rows = words clustered on ``top`` (gap > y_tol starts a row);
      * column edges = distinct word LEFT positions clustered with
        x_tol (text-alignment strategy: columns exist where text
        aligns);
      * each word lands in its nearest column; multi-word cells join
        with spaces in x order;
      * reference cleaning applied: cells stripped, all-empty rows
        dropped (pdfplumber loader :159-170).

    Words: dicts with ``text, x0, top`` (``x1/bottom`` optional,
    accepted for pdfplumber word-shape compatibility). Pure function;
    the Spark entry is :func:`table_from_words_udf`.
    """
    ws = [w for w in words or [] if (w.get("text") or "").strip()]
    if not ws:
        return []
    # rows: cluster on top
    ordered = sorted(ws, key=lambda w: (w["top"], w["x0"]))
    rows: list[list[dict]] = [[ordered[0]]]
    for w in ordered[1:]:
        if w["top"] - rows[-1][-1]["top"] > y_tol:
            rows.append([w])
        else:
            rows[-1].append(w)
    # columns: cluster distinct left edges across the whole table
    col_reps: list[float] = []
    for x in sorted(w["x0"] for w in ws):
        if not col_reps or x - col_reps[-1] > x_tol:
            col_reps.append(x)

    import bisect

    def col_of(x: float) -> int:
        i = bisect.bisect_right(col_reps, x)
        if i == 0:
            return 0
        if i == len(col_reps):
            return i - 1
        return i - 1 if x - col_reps[i - 1] <= col_reps[i] - x else i

    table = []
    for row_words in rows:
        cells = ["" for _ in col_reps]
        for w in sorted(row_words, key=lambda w: w["x0"]):
            ci = col_of(w["x0"])
            t = w["text"].strip()
            cells[ci] = f"{cells[ci]} {t}".strip() if cells[ci] else t
        table.append(cells)
    return [r for r in table if any(c != "" for c in r)]


WORDS_SCHEMA = "array<struct<text:string, x0:double, top:double>>"


def table_from_words_udf(
    words: Column, x_tol: float = 10.0, y_tol: float = 10.0
) -> Column:
    """Arrow-batched column form of :func:`words_to_table`:
    array<struct<text,x0,top>> → array<array<string>> (rows of
    cells). Compose with :func:`table_to_markdown` for the S6 render
    path. Narrow map, no shuffle; one page's words per row."""

    @F.pandas_udf("array<array<string>>")
    def _detect(pages: pd.Series) -> pd.Series:
        return pages.map(
            lambda ws: words_to_table(
                [dict(w) for w in ws], x_tol=x_tol, y_tol=y_tol
            )
            if ws is not None
            else [],
        )

    # plan barrier (guide §4.4): the downstream explode infers a
    # size()>0 filter that the optimizer pushed below the repartition
    # with a DUPLICATE ArrowEvalPython of this UDF on the unsplittable
    # scan; non-determinism forbids the duplication
    return _detect.asNondeterministic()(words)


def table_to_markdown(table: Column) -> Column:
    """array<array<string>> (rows of cells) → markdown table: first row
    is the header, then the |---| separator, then data rows
    (convert_table_to_text, document_loader_docling.py:337-355)."""
    row_md = lambda r: F.concat(  # noqa: E731
        F.lit("| "), F.array_join(r, " | "), F.lit(" |")
    )
    header = row_md(F.element_at(table, 1))
    sep = F.concat(
        F.lit("|"),
        F.array_join(
            F.transform(F.element_at(table, 1), lambda _: F.lit("---")), "|"
        ),
        F.lit("|"),
    )
    body = F.transform(F.slice(table, 2, F.greatest(F.size(table) - 1, F.lit(0))), row_md)
    return F.when(F.size(table) == 0, F.lit("")).otherwise(
        F.array_join(F.concat(F.array(header, sep), body), "\n")
    )


def pages_to_pdf_spans(segmented: DataFrame) -> DataFrame:
    """(doc_id, page_no, page_text) → documents(doc_id, spans) of
    pdf_text spans with the ``\\fPAGE k\\n`` header convention, ordered
    by page_no from the data."""
    spans = segmented.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("page_no", "page_text"))),
            lambda s, i: F.struct(
                F.lit("pdf_text").alias("kind"),
                F.concat(
                    F.lit("\fPAGE "),
                    s["page_no"].cast("string"),
                    F.lit("\n"),
                    s["page_text"],
                ).alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans")
    )
    return spans
