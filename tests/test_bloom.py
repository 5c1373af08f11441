"""Bloom incremental dedup: no false negatives, FP-rate sanity,
literal-probe == join-probe parity, composed pipeline semantics."""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.operators.bloom import (
    WORD_BITS,
    bloom_maybe,
    bloom_probe_join,
    build_bloom,
    collect_bloom,
    dedup_against_corpus,
)

M, K = 1 << 14, 5


def _corpus(spark, n=300, prefix="corpus"):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(f"{prefix} document body "), F.col("id")).alias(
            "text"
        ),
    )


def test_no_false_negatives_and_fp_rate(spark):
    corpus = _corpus(spark)
    words = collect_bloom(build_bloom(corpus, m_bits=M, k=K), M)
    assert len(words) == M // WORD_BITS + 1
    # every corpus member probes positive
    hits = corpus.select(
        bloom_maybe(F.col("text"), words, M, K).alias("h")
    ).collect()
    assert all(r.h for r in hits)
    # non-members: FP rate well under 5% at this fill factor
    fresh = _corpus(spark, 400, prefix="fresh")
    fp = (
        fresh.select(bloom_maybe(F.col("text"), words, M, K).alias("h"))
        .filter("h")
        .count()
    )
    assert fp < 20


def test_literal_and_join_probes_agree(spark):
    corpus = _corpus(spark)
    bloom_df = build_bloom(corpus, m_bits=M, k=K)
    words = collect_bloom(bloom_df, M)
    shard = _corpus(spark, 150, prefix="corpus").unionByName(
        _corpus(spark, 150, prefix="other")
        .select((F.col("doc_id") + 1000).alias("doc_id"), "text")
    )
    lit = {
        r.doc_id: r.h
        for r in shard.select(
            "doc_id", bloom_maybe(F.col("text"), words, M, K).alias("h")
        ).collect()
    }
    jn = {
        r.doc_id: r.bloom_maybe
        for r in bloom_probe_join(
            shard, bloom_df, m_bits=M, k=K
        ).collect()
    }
    assert lit == jn and len(lit) == 300


def test_dedup_against_corpus_pipeline(spark):
    corpus = _corpus(spark, 250)
    # shard: 40 true dups (ids 0-39 share corpus text) + 60 fresh
    shard = _corpus(spark, 40).unionByName(
        _corpus(spark, 60, prefix="fresh").select(
            (F.col("doc_id") + 500).alias("doc_id"), "text"
        )
    )
    out = {
        r.doc_id: (r.bloom_maybe, r.is_dup)
        for r in dedup_against_corpus(
            shard, corpus, m_bits=M, k=K
        ).collect()
    }
    assert len(out) == 100
    for i in range(40):
        assert out[i] == (True, True)
    fresh_dups = [i for i in range(500, 560) if out[i][1]]
    assert fresh_dups == []  # exact verify kills every Bloom FP
    # bloom_maybe ⊇ is_dup by construction
    assert all(m or not d for m, d in out.values())
