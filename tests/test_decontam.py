from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.operators.decontam import (
    benchmark_grams,
    contamination_hits,
    decontaminate,
)


def _corpus(spark):
    rows = [
        # 15 words; contains the bench 13-gram run "w1 .. w13"
        (0, " ".join(f"w{i}" for i in range(1, 16))),
        # same leading 13 words, different tail — also contaminated
        (1, " ".join(f"w{i}" for i in range(1, 14)) + " zz yy"),
        # clean: disjoint vocabulary
        (2, " ".join(f"q{i}" for i in range(1, 16))),
        # short doc (< n words): its only (short) gram must not match
        (3, "w1 w2 w3"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    # one eval example whose text embeds the w1..w13 run
    return spark.createDataFrame(
        [("Q: " + " ".join(f"w{i}" for i in range(1, 14)) + "?",)],
        "text string",
    )


def test_contamination_hits_flags_planted_overlap(spark):
    hits = {
        r["doc_id"]: (r["hits"], r["top_gram"])
        for r in contamination_hits(
            _corpus(spark), _bench(spark), n=13
        ).collect()
    }
    gram = " ".join(f"w{i}" for i in range(1, 14))
    assert hits == {0: (1, gram), 1: (1, gram)}


def test_decontaminate_drops_only_contaminated(spark):
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(_corpus(spark), _bench(spark), n=13).collect()
    )
    assert kept == [2, 3]


def test_benchmark_grams_distinct_and_nonempty(spark):
    bench = spark.createDataFrame(
        [("a b c d",), ("a b c d",), ("",)], "text string"
    )
    grams = sorted(r["gram"] for r in benchmark_grams(bench, n=3).collect())
    assert grams == ["a b c", "b c d"]


def test_short_doc_gram_matches_short_bench_gram(spark):
    # docs with < n words emit ONE shortened gram (join of all words) —
    # it only matches if the bench set contains the same short doc.
    corpus = spark.createDataFrame([(7, "tiny doc")], "doc_id long, text string")
    bench = spark.createDataFrame([("tiny doc",)], "text string")
    out = contamination_hits(corpus, bench, n=13).collect()
    assert len(out) == 1 and out[0]["hits"] == 1


def test_hits_plan_broadcasts_bench(spark):
    plan = contamination_hits(
        _corpus(spark), _bench(spark), n=13
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # per-doc agg must be map-combinable (partial before the exchange)
    assert "partial_count" in plan
