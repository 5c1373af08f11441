"""End-to-end pipeline: span-sequence golden equality (the north-rule
invariant — (kind, text, media_ref, order) per document)."""

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.corpus import corpus_pandas, corpus_spark, goldens_pandas
from extractthinker_spark.plans.pipeline import doc_text, extract_main_content
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

N_DOCS = 200


@pytest.fixture(scope="module")
def extracted(spark):
    docs = spark.createDataFrame(
        corpus_pandas(N_DOCS)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    )
    return extract_main_content(docs).cache()


def _span_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_span_sequence_equality(extracted):
    goldens = goldens_pandas(N_DOCS)["expected_spans"]
    got = {r["doc_id"]: r["spans"] for r in extracted.collect()}
    assert len(got) == N_DOCS
    mismatches = []
    for _, row in goldens.iterrows():
        exp = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        act = _span_tuples(got[row["doc_id"]])
        if exp != act:
            mismatches.append((row["doc_id"], exp[:2], act[:2]))
    assert not mismatches, f"{len(mismatches)} docs mismatch; first: {mismatches[:3]}"


def test_offsets_resequenced(extracted):
    bad = extracted.select(
        "doc_id",
        F.exists(
            F.zip_with(
                "spans",
                F.sequence(F.lit(0), F.size("spans") - 1),
                lambda s, i: s["offset"] != i,
            ),
            lambda x: x,
        ).alias("bad"),
    ).filter("bad").count()
    assert bad == 0


def test_spark_generator_matches_pandas(spark):
    via_spark = corpus_spark(spark, 50, partitions=7).collect()
    local = corpus_pandas(50)
    exp = {r["doc_id"]: r["spans"] for _, r in local.iterrows()}
    assert len(via_spark) == 50
    for row in via_spark:
        got = [
            {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"],
             "offset": s["offset"]}
            for s in row["spans"]
        ]
        assert got == exp[row["doc_id"]], row["doc_id"]


def test_doc_text_merge(spark, extracted):
    dt = doc_text(extracted)
    row = dt.filter(F.col("doc_id") == "doc_000000").collect()[0]
    assert row["content"].startswith("Invoice #")
    assert row["num_spans"] == 1
    # media spans have NULL text and are excluded from the join
    inter = dt.join(
        extracted.select("doc_id", F.size("spans").alias("n")), "doc_id"
    ).filter(F.col("doc_id") == "doc_000085").collect()[0]
    assert "[Image content: img-0]" in inter["content"]


def test_drop_media_spans(spark):
    from extractthinker_spark.operators.parse_core import drop_media_spans
    from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

    rows = [
        ("d1", [
            {"kind": "text", "text": "a", "media_ref": None, "offset": 0},
            {"kind": "media", "text": None, "media_ref": "img://1", "offset": 1},
            {"kind": "text", "text": "b", "media_ref": None, "offset": 2},
        ]),
        ("d2", [
            {"kind": "media", "text": None, "media_ref": "img://2", "offset": 0},
        ]),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    got = {
        r["doc_id"]: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                      for s in r["spans"]]
        for r in df.select(
            "doc_id", drop_media_spans(F.col("spans")).alias("spans")
        ).collect()
    }
    # media spans gone, offsets re-sequenced, media_ref nulled
    assert got["d1"] == [("text", "a", None, 0), ("text", "b", None, 1)]
    assert got["d2"] == []


def test_json_extraction_matches_reference_semantics(spark):
    """Bare candidate = first '{' to FIRST '}' (utils.py:200-214): flat
    objects parse; nested unfenced objects yield an unbalanced candidate
    -> NULL fields (the reference's json.loads failure -> None), never
    the wrong (innermost) object."""
    from extractthinker_spark.operators.parse_core import (
        extract_json_str,
        parse_json_fields,
    )

    df = spark.createDataFrame(
        [
            (1, 'pre {"a": {"id": 1}} post'),            # nested bare
            (2, 'inline {"id": 7, "status": "x"} t'),     # flat bare
            (3, '```json\n{"id": 9, "status": "y"}\n```'),  # fenced wins
            (4, "no json at all"),
        ],
        "i int, t string",
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            extract_json_str(F.col("t")).alias("js"),
            parse_json_fields(F.col("t"), "id bigint, status string").alias("p"),
        ).collect()
    }
    # nested: candidate is the reference's (unbalanced) match, fields NULL
    assert out[1]["js"] == '{"a": {"id": 1}'
    assert out[1]["p"]["id"] is None and out[1]["p"]["status"] is None
    assert out[2]["p"]["id"] == 7 and out[2]["p"]["status"] == "x"
    assert out[3]["p"]["id"] == 9
    assert out[4]["js"] is None and out[4]["p"] is None


def test_concatenate_parts_stitching(spark):
    """CONCATENATE strategy (concatenation_handler.py:30-97): parts
    filtered by the JSON-continuation gate, cleaned of fences, joined
    in part order, parsed once; unparseable combinations yield NULL
    parsed (the json.loads-failure path)."""
    from extractthinker_spark.operators.parse_core import concatenate_parts

    rows = [
        # doc a: fenced opener + garbage (dropped) + closer
        ("a", 0, '```json\n{"x": 1, '),
        ("a", 1, "plain text, no markers"),
        ("a", 2, '"y": [2]}\n```'),
        # doc b: parts arrive out of order in the input
        ("b", 1, '"y": [9]}```'),
        ("b", 0, '```json{"x": 8, '),
        # doc c: only garbage -> empty combined, NULL parsed
        ("c", 0, "nothing here"),
        # doc d: markers but malformed JSON -> NULL parsed
        ("d", 0, "{broken"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, part_no int, part string")
    out = {
        r["doc_id"]: r
        for r in concatenate_parts(
            df, keys=["doc_id"], schema="x bigint, y array<int>"
        ).collect()
    }
    assert out["a"]["combined_json"] == '{"x": 1,"y": [2]}'
    assert out["a"]["parsed"]["x"] == 1 and out["a"]["parsed"]["y"] == [2]
    assert out["b"]["parsed"]["x"] == 8 and out["b"]["parsed"]["y"] == [9]
    assert out["c"]["combined_json"] == ""
    assert out["c"]["parsed"] is None or out["c"]["parsed"]["x"] is None
    assert out["d"]["parsed"] is None or out["d"]["parsed"]["x"] is None
