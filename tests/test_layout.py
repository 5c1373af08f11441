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
