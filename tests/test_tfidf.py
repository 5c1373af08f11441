from __future__ import annotations

import math

import pyspark.sql.functions as F

from extractthinker_spark.functions.tfidf import (
    document_frequencies,
    term_counts,
    tfidf_top_terms,
)


def _docs(spark):
    return spark.createDataFrame(
        [
            (0, "apple apple banana common"),
            (1, "banana cherry common"),
            (2, "cherry cherry cherry common"),
            (3, "apple date common"),
        ],
        "doc_id long, text string",
    )


def test_term_counts_and_df(spark):
    tc = term_counts(_docs(spark), "doc_id", "text")
    got = {(r["doc_id"], r["term"]): r["tf"] for r in tc.collect()}
    assert got[(0, "apple")] == 2 and got[(2, "cherry")] == 3
    dfreq, _ = document_frequencies(tc, "doc_id")
    dfs = {r["term"]: r["df"] for r in dfreq.collect()}
    assert dfs == {"apple": 2, "banana": 2, "cherry": 2, "common": 4, "date": 1}


def test_max_df_prunes_boilerplate(spark):
    tc = term_counts(_docs(spark), "doc_id", "text")
    dfreq, _ = document_frequencies(tc, "doc_id", max_df_frac=0.75)
    assert "common" not in {r["term"] for r in dfreq.collect()}  # df 4/4


def test_top_terms_scores_and_ranks(spark):
    out = tfidf_top_terms(_docs(spark), k=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    top0 = sorted(by_doc[0], key=lambda r: r["rank"])
    # doc 0: apple tf=2 idf=ln(2) -> 1.3863 beats banana ln(2)=0.6931;
    # 'common' scores ln(1)=0 and never ranks above them
    assert top0[0]["term"] == "apple"
    assert top0[0]["score"] == round(2 * math.log(4 / 2), 4)
    assert top0[1]["term"] == "banana"
    assert all(r["rank"] <= 2 for r in out)
    # deterministic tie-break: doc 1 banana vs cherry both 0.6931 ->
    # term ASC puts banana first
    top1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert [r["term"] for r in top1] == ["banana", "cherry"]


def test_plan_broadcast_idf_and_window_limit(spark):
    plan = (
        tfidf_top_terms(_docs(spark), k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "WindowGroupLimit" in plan
