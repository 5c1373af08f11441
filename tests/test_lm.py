from __future__ import annotations

import math

import pyspark.sql.functions as F

from extractthinker_spark.functions.lm import score_bigram_lm, train_bigram_lm


def _model(spark, vocab_size=2):
    train = spark.createDataFrame([("a b a b",), ("a c",)], "text string")
    return train_bigram_lm(train, vocab_size=vocab_size)


def test_train_counts_and_vocab(spark):
    m = _model(spark)
    assert sorted(r["w"] for r in m.vocab.collect()) == ["a", "b"]
    assert m.v_df.collect()[0]["v"] == 3
    bi = {(r["w1"], r["w2"]): r["c12"] for r in m.bigram.collect()}
    # doc1: (a,b),(b,a),(a,b); doc2: (a,c) with c -> <unk>
    assert bi == {("a", "b"): 2, ("b", "a"): 1, ("a", "<unk>"): 1}
    marg = {r["w1"]: r["c1"] for r in m.marginal.collect()}
    assert marg == {"a": 3, "b": 1}


def test_score_known_values(spark):
    m = _model(spark)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c c"), (2, "solo")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in score_bigram_lm(docs, m).collect()}
    # (a,b): ln((2+1)/(3+3)) = ln(.5)
    assert out[0]["n_terms"] == 1
    assert out[0]["avg_logprob"] == round(math.log(0.5), 4)
    # (<unk>,<unk>): unseen bigram, absent marginal -> ln(1/(0+3))
    assert out[1]["avg_logprob"] == round(math.log(1 / 3), 4)
    # < 2 words: no transition to score, absent from output
    assert 2 not in out


def test_min_count_prunes_to_unseen(spark):
    # words a,b,a,b,a,c -> bigrams (a,b)x2 (b,a)x2 (a,c)x1
    train = spark.createDataFrame([("a b a b a c",)], "text string")
    m = train_bigram_lm(train, vocab_size=10, min_count=2)
    bi = {(r["w1"], r["w2"]): r["c12"] for r in m.bigram.collect()}
    assert bi == {("a", "b"): 2, ("b", "a"): 2}  # (a,c):1 pruned
    # pruned bigram scores as unseen but the marginal keeps full mass:
    # c1(a)=3, V=4 (a,b,c + <unk>) -> ln(1/7)
    docs = spark.createDataFrame([(0, "a c")], "doc_id long, text string")
    lp = score_bigram_lm(docs, m).collect()[0]["avg_logprob"]
    assert lp == round(math.log(1 / 7), 4)


def test_scoring_plan_is_broadcast_only(spark):
    m = _model(spark)
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        score_bigram_lm(docs, m)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan
