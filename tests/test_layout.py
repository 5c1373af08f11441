"""XY-cut layout segmentation: pure-core goldens + Spark surface."""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.operators.layout import (
    pages_to_pdf_spans,
    segment_pages,
    xy_cut_order,
)

# Boxes are (x0, y0, x1, y1); min_gap default 0.5.


def test_two_column_reads_column_major():
    # Left column (x in [0,.2]) rows 0..2, right column (x in [.8,1]).
    boxes = [
        (0.8, 0.0, 1.0, 0.8),  # R0  idx 0
        (0.0, 0.0, 0.2, 0.8),  # L0  idx 1
        (0.0, 1.0, 0.2, 1.8),  # L1  idx 2
        (0.8, 1.0, 1.0, 1.8),  # R1  idx 3
        (0.0, 2.0, 0.2, 2.8),  # L2  idx 4
    ]
    # Row gaps (0.2) < min_gap → no horizontal cut; gutter (0.6) →
    # vertical cut; then (y0, x0) order within each column.
    assert xy_cut_order(boxes) == [1, 2, 4, 0, 3]


def test_header_body_footer_recursion():
    # Full-width header, 2-column body, full-width footer, with wide
    # vertical gaps between the three bands.
    boxes = [
        (0.0, 4.0, 1.0, 4.5),  # footer      idx 0
        (0.0, 0.0, 1.0, 0.5),  # header      idx 1
        (0.8, 1.2, 1.0, 2.0),  # body R0     idx 2
        (0.0, 1.2, 0.2, 2.0),  # body L0     idx 3
        (0.0, 2.2, 0.2, 3.0),  # body L1     idx 4
    ]
    # Horizontal cuts: header | body | footer; body then cut vertically.
    assert xy_cut_order(boxes) == [1, 3, 4, 2, 0]


def test_atomic_region_row_major():
    # Overlapping projections everywhere → single atomic region,
    # (y0, x0) order.
    boxes = [
        (0.3, 0.3, 0.7, 0.7),
        (0.0, 0.0, 0.5, 0.5),
        (0.4, 0.1, 0.9, 0.6),
    ]
    assert xy_cut_order(boxes) == [1, 2, 0]


def test_empty_and_single():
    assert xy_cut_order([]) == []
    assert xy_cut_order([(0, 0, 1, 1)]) == [0]


def test_segment_pages_spark(spark):
    rows = [
        (
            "d1",
            1,
            [
                ("right-top", 0.8, 0.0, 1.0, 0.8),
                ("left-top", 0.0, 0.0, 0.2, 0.8),
                ("left-bot", 0.0, 1.0, 0.2, 1.8),
            ],
        ),
        ("d1", 2, [("only", 0.0, 0.0, 1.0, 1.0)]),
        ("d2", 1, []),
    ]
    pages = spark.createDataFrame(
        rows,
        "doc_id string, page_no int, blocks array<struct<"
        "text:string, x0:double, y0:double, x1:double, y1:double>>",
    )
    seg = segment_pages(pages)
    got = {
        (r["doc_id"], r["page_no"]): (r["reading_order"], r["page_text"])
        for r in seg.collect()
    }
    assert got[("d1", 1)] == ([1, 2, 0], "left-top\nleft-bot\nright-top")
    assert got[("d1", 2)] == ([0], "only")
    assert got[("d2", 1)] == ([], "")

    spans = {r["doc_id"]: r["spans"] for r in pages_to_pdf_spans(seg).collect()}
    assert [s["offset"] for s in spans["d1"]] == [0, 1]
    assert spans["d1"][0]["text"] == "\fPAGE 1\nleft-top\nleft-bot\nright-top"
    assert spans["d1"][1]["kind"] == "pdf_text"

    # Determinism: identical plan re-run → identical result.
    again = {
        (r["doc_id"], r["page_no"]): (r["reading_order"], r["page_text"])
        for r in segment_pages(pages).collect()
    }
    assert again == got


def test_words_to_table_text_strategy():
    """pdfplumber 'text' strategy semantics (S6): rows from top
    clustering, columns from aligned left edges, multi-word cells join
    in x order, empty cells keep placeholders, all-empty rows drop."""
    from extractthinker_spark.operators.layout import words_to_table

    def w(text, x0, top):
        return {"text": text, "x0": x0, "top": top}

    # header: two words land in the SAME column cluster (120/121) ->
    # one cell "Unit Price"; third column at 240
    words = [
        w("Item", 0, 0), w("Unit", 120, 2), w("Price", 121, 3),
        w("Qty", 240, 1),
        # data row 1, out of input order on purpose
        w("4", 243, 31), w("Widget", 2, 30), w("9.50", 118, 33),
        # data row 2: middle cell empty
        w("Bolt", 1, 62), w("7", 241, 60),
        # whitespace-only word is ignored entirely
        w("   ", 120, 61),
    ]
    assert words_to_table(words) == [
        ["Item", "Unit Price", "Qty"],
        ["Widget", "9.50", "4"],
        ["Bolt", "", "7"],
    ]
    assert words_to_table([]) == []
    # y_tol merges nearby lines; a coarser tolerance merges rows
    assert len(words_to_table(words, y_tol=100.0)) == 1


def test_table_from_words_udf_and_markdown(spark):
    from extractthinker_spark.operators.layout import (
        WORDS_SCHEMA,
        table_from_words_udf,
        table_to_markdown,
    )

    rows = [
        ("d1", [("A", 0.0, 0.0), ("B", 100.0, 1.0),
                ("1", 2.0, 30.0), ("2", 101.0, 31.0)]),
        ("d2", []),
    ]
    df = spark.createDataFrame(rows, f"doc_id string, words {WORDS_SCHEMA}")
    out = df.select(
        "doc_id", table_from_words_udf(F.col("words")).alias("t")
    ).select("doc_id", "t", table_to_markdown(F.col("t")).alias("md"))
    got = {r["doc_id"]: r for r in out.collect()}
    assert [list(r) for r in got["d1"]["t"]] == [["A", "B"], ["1", "2"]]
    assert got["d1"]["md"] == "| A | B |\n|---|---|\n| 1 | 2 |"
    assert list(got["d2"]["t"]) == [] and got["d2"]["md"] == ""


def test_markdown_assembly(spark):
    from extractthinker_spark.operators.layout import (
        LABELED_BLOCK_SCHEMA,
        labeled_blocks_to_markdown,
        table_to_markdown,
    )

    blocks = [
        {"label": "TITLE", "text": "Doc"},
        {"label": "section_header", "text": "Part"},
        {"label": "list_item", "text": "one"},
        {"label": "code", "text": "x = 1"},
        {"label": "paragraph", "text": "body"},
    ]
    df = spark.createDataFrame(
        [("p1", blocks)], f"page string, blocks {LABELED_BLOCK_SCHEMA}"
    )
    md = df.select(labeled_blocks_to_markdown(F.col("blocks")).alias("m")).collect()[0]["m"]
    assert md == "# Doc\n\n## Part\n\n- one\n\n```\nx = 1\n```\n\nbody"

    t = spark.createDataFrame(
        [([["h1", "h2"], ["a", "b"], ["c", "d"]],)],
        "table array<array<string>>",
    )
    got = t.select(table_to_markdown(F.col("table")).alias("m")).collect()[0]["m"]
    assert got == "| h1 | h2 |\n|---|---|\n| a | b |\n| c | d |"
