"""Classification: golden names, strategies, tree walk."""

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.corpus import corpus_pandas, goldens_pandas
from extractthinker_spark.operators.classify import (
    classify_fields,
    classify_header,
    classify_keyword,
    classify_tree,
    consensus,
    consensus_with_threshold,
    higher_order,
    layered,
)
from extractthinker_spark.plans.pipeline import doc_text, extract_main_content
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

N_DOCS = 200


@pytest.fixture(scope="module")
def doc_texts(spark):
    docs = spark.createDataFrame(
        corpus_pandas(N_DOCS)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    )
    return doc_text(extract_main_content(docs)).cache()


def test_keyword_matches_goldens(doc_texts):
    golden = goldens_pandas(N_DOCS)["expected_classification"]
    res = doc_texts.select(
        "doc_id", classify_keyword(F.col("content")).alias("c")
    ).select("doc_id", "c.name", "c.confidence")
    got = {r["doc_id"]: (r["name"], r["confidence"]) for r in res.collect()}
    bad = [
        (row.doc_id, (row.name, row.confidence), got[row.doc_id])
        for row in golden.itertuples()
        if got[row.doc_id] != (row.name, row.confidence)
    ]
    assert not bad, f"{len(bad)} mismatches, first: {bad[:5]}"


def test_strategies(doc_texts):
    c1 = classify_keyword(F.col("content"))
    c2 = classify_header(F.col("content"))
    c3 = classify_fields(F.col("content"))
    df = doc_texts.select(
        "doc_id",
        consensus(c1, c2, c3).alias("cons"),
        higher_order(c1, c2, c3).alias("hi"),
        consensus_with_threshold(9, c1, c2, c3).alias("thr"),
        layered(consensus_with_threshold(9, c1, c2, c3), c1).alias("lay"),
    ).cache()
    inv = df.filter("doc_id = 'doc_000000'").collect()[0]
    # invoice: keyword=10, header=10, fields=10 → all strategies agree
    assert inv["cons"]["name"] == "Invoice"
    assert inv["hi"]["name"] == "Invoice"
    assert inv["thr"]["name"] == "Invoice"
    # ambiguous credit note (bucket 24-31): keyword conf 8 < 9 threshold
    cn = df.filter("doc_id = 'doc_000024'").collect()[0]
    assert cn["thr"] is None or cn["thr"]["name"] != "Invoice"
    assert cn["lay"]["name"] == "Credit Note"  # falls back to keyword layer
    # higher_order picks max confidence everywhere it exists
    assert df.filter("hi.confidence < 1").count() == 0


def test_strategy_ties_keep_first_scorer(spark):
    """Reference tie semantics (process.py:104-114): CONSENSUS and
    CONSENSUS_WITH_THRESHOLD return group_classifications[0]; Python
    ``max(..., key=confidence)`` keeps the FIRST maximal element."""

    def res(name, conf):
        return F.struct(
            F.lit(name).alias("name"), F.lit(conf).alias("confidence")
        )

    row = (
        spark.range(1)
        .select(
            # all agree, differing confidence: first scorer's conf wins
            consensus(res("A", 7), res("A", 9), res("A", 8)).alias("cons"),
            # confidence tie between scorer 1 ('B') and scorer 2 ('A'):
            # lexicographically 'B' > 'A' but FIRST scorer must win
            higher_order(res("B", 9), res("A", 9), res("C", 3)).alias("hi"),
            consensus_with_threshold(
                5, res("A", 6), res("A", 9), res("A", 7)
            ).alias("thr"),
        )
        .collect()[0]
    )
    assert (row["cons"]["name"], row["cons"]["confidence"]) == ("A", 7)
    assert (row["hi"]["name"], row["hi"]["confidence"]) == ("B", 9)
    assert (row["thr"]["name"], row["thr"]["confidence"]) == ("A", 6)


def test_tree(spark):
    tree = {
        "nodes": [
            {
                "name": "Identity Document",
                "patterns": [r"(?i)driver license", r"(?i)license no"],
                "children": [
                    {"name": "Driver License",
                     "patterns": [r"(?i)driver license", r"(?i)license no",
                                  r"(?i)\bage:", r"(?i)\bname:"],
                     "children": None},
                ],
            },
            {
                "name": "Financial Document",
                "patterns": [r"(?i)invoice", r"(?i)total:"],
                "children": [
                    {"name": "Invoice",
                     "patterns": [r"(?i)invoice\s*#", r"(?i)total:",
                                  r"(?i)date:", r"=\s*\d"],
                     "children": None},
                    {"name": "Credit Note",
                     "patterns": [r"(?i)credit note", r"(?i)reference invoice",
                                  r"(?i)total:"],
                     "children": None},
                ],
            },
        ]
    }
    df = spark.createDataFrame(
        [
            ("a", "Invoice #1\nDate: 1/1/11\nX 1 x 2 = 2\nTotal: 2"),
            ("b", "DRIVER LICENSE\nName: X\nAge: 30\nLicense No: 123"),
            ("c", "CREDIT NOTE\nReference Invoice #9\nTotal: 5"),
            ("d", "nothing relevant"),
        ],
        ["doc_id", "content"],
    )
    out = {r["doc_id"]: r for r in classify_tree(df, "content", tree, threshold=6).collect()}
    assert out["a"]["tree_path"] == ["Financial Document", "Invoice"]
    assert out["a"]["tree_class"] == "Invoice"
    assert out["b"]["tree_path"] == ["Identity Document", "Driver License"]
    assert out["c"]["tree_class"] == "Credit Note"
    assert out["d"]["tree_class"] is None and out["d"]["tree_path"] == []
