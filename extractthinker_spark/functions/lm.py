"""Bigram language-model quality scoring — the CCNet shape (Wenzek et
al. 2020 scores Common-Crawl docs with a KenLM model trained on a
trusted corpus and keeps the low-perplexity head). The reference does
no corpus curation; this belongs to the training-data-pipeline family
the driver brief adds. We train an add-one-smoothed word-BIGRAM model
(deterministic, engine-replayable) instead of a 5-gram KenLM: same
pipeline role, no external model artifact.

Scale shape (the part that matters at 100 TB):

  * Training is two map-combinable groupBys (bigram counts, then the
    left marginal), i.e. hash shuffles on words — never on documents.
    ``vocab_size`` caps the vocabulary (everything else maps to
    ``<unk>``) and ``min_count`` prunes rare bigrams, so the model is
    small by construction.
  * Scoring never reassembles token arrays: bigrams are formed
    positionally inside the doc row (codegen'd slice+arrays_zip),
    exploded, vocab-mapped with an InSet expression (the collected
    vocab is <= vocab_size by construction), joined against the
    BROADCAST precomputed log-prob tables, and re-aggregated with ONE
    map-combinable groupBy on the doc key. No corpus-side wide
    shuffle beyond that single keyed agg.
  * ``V`` (the smoothing denominator) rides along as a broadcast
    1-row cross join — no plan-time .count() job (NOTES.md: Lloyd
    init rule).

Cross-engine float protocol: every per-bigram term is
``ln((c12+1)/(c1+V))`` — integer counts, ONE double division, one
``ln``. The per-doc sum is rounded to 4 decimals only after the final
division (HALF_UP on both engines; summation-order noise is ~1e-13,
four orders below the rounding step — same margin argument as the
IVF/LSH protocols in NOTES.md).
"""

from __future__ import annotations

from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

UNK = "<unk>"

_WORD_RE = r"[a-z0-9]+"


def _words(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), F.lit(0))


def _bigram_rows(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """One row per consecutive word pair. Docs with < 2 words emit
    nothing (a bigram model has no transition to score).

    Codegen shape: two array slices zipped — the previous
    ``transform(sequence(1, n-1), i -> element_at(w, i))`` form is a
    higher-order function (interpreted) that re-evaluates the word
    array per element; slice/arrays_zip are whole-stage-codegen'd with
    the repeated word-array subtree CSE'd."""
    w = _words(F.col(text_col))
    zipped = F.arrays_zip(
        F.slice(w, 1, F.size(w) - 1).alias("w1"),
        F.slice(w, 2, F.size(w) - 1).alias("w2"),
    )
    pairs = F.when(F.size(w) >= 2, zipped).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )
    return df.select(F.col(key).alias(key), F.explode(pairs).alias("p")).select(
        key, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


class BigramLM(NamedTuple):
    """A trained model: three small DataFrames (callers broadcast them
    at scoring time) + the 1-row smoothing denominator."""

    vocab: DataFrame      # (w)              — kept vocabulary, excl. <unk>
    bigram: DataFrame     # (w1, w2, c12)    — mapped bigram counts
    marginal: DataFrame   # (w1, c1)         — left marginal of `bigram`
    v_df: DataFrame       # (v)              — |vocab| + 1 (the <unk> slot)


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 10000,
    min_count: int = 1,
) -> BigramLM:
    """Train on a trusted corpus. Vocabulary = top ``vocab_size``
    unigrams by count (ties broken lexicographically — deterministic);
    out-of-vocab tokens on BOTH bigram sides map to ``<unk>`` before
    counting, so the model is closed over vocab ∪ {<unk>} and add-one
    smoothing normalizes exactly. Bigrams with mapped count <
    ``min_count`` are pruned (they fall back to the unseen add-one
    mass at scoring time).

    Deliberate tradeoff: with ``min_count > 1`` pruned bigrams score
    with numerator 1 (the unseen mass) while the left marginal keeps
    their mass in the denominator, so conditional probabilities no
    longer sum to exactly 1 over vocab ∪ {<unk>}. ``avg_logprob``
    values are therefore only comparable between models trained with
    the SAME ``min_count`` (ranking within one model is unaffected)."""
    # key column is irrelevant for training; synthesize one
    d = df.select(F.monotonically_increasing_id().alias("_k"), text_col)
    bg = _bigram_rows(d, "_k", text_col)

    uni = (
        d.select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .count()
    )
    # top-K via sort+limit → TakeOrderedAndProject (per-partition
    # partial top-K, merge on the driver) — NOT a single-partition
    # row_number window, which would funnel the whole unigram table
    # through one task at web scale.
    # Materialize the model-sized tables ONCE (localCheckpoint —
    # bounded by the pruned vocab/bigram size). Scoring broadcasts
    # vocab twice and the model tables once each; without the
    # checkpoint every broadcast re-runs the whole training scan +
    # explode + aggs (~6 recomputations — measured dominating lm_score
    # wall time at bench scale).
    vocab = (
        uni.orderBy(F.desc("count"), F.asc("w")).limit(vocab_size).select("w")
    ).localCheckpoint()
    # one broadcast left join + coalesce per bigram side (the same
    # _map_side the scorer uses — a semi/anti union pair would cost
    # four joins and two unions for the identical result)
    mapped = _map_side(_map_side(bg, "w1", vocab), "w2", vocab)
    bigram_full = (
        mapped.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint()
    )
    bigram = bigram_full.filter(F.col("c12") >= min_count)
    # left marginal derived from the aggregated table, NOT a second
    # pass over the mapped bigram rows: c1 = Σ_w2 c12 (same value —
    # the count of w1 occurrences as a left element), and min_count
    # pruning must NOT reduce the marginal mass, so derive from the
    # unpruned counts.
    marginal = bigram_full.groupBy("w1").agg(F.sum("c12").alias("c1"))
    v_df = vocab.agg((F.count(F.lit(1)) + 1).alias("v"))
    return BigramLM(vocab=vocab, bigram=bigram, marginal=marginal, v_df=v_df)


def _map_side(bg: DataFrame, side: str, vocab: DataFrame) -> DataFrame:
    """Map one bigram side through the vocabulary via a broadcast left
    join (single pass — unlike training we don't need the anti split
    because scoring only reads the mapped value)."""
    v = F.broadcast(vocab.select(F.col("w").alias(f"_{side}_v")))
    return bg.join(
        v, F.col(side) == F.col(f"_{side}_v"), "left"
    ).withColumn(side, F.coalesce(f"_{side}_v", F.lit(UNK))).drop(f"_{side}_v")


def score_bigram_lm(
    df: DataFrame,
    model: BigramLM,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document mean bigram log-probability (natural log; higher =
    more like the training corpus). Returns (key, n_terms,
    avg_logprob); docs with < 2 words are absent. CCNet keeps the
    best-scoring head/middle of the distribution — pair with
    ``F.percent_rank`` downstream for that cut."""
    bg = _bigram_rows(df, key, text_col)
    # Vocabulary mapping as an InSet expression instead of two
    # broadcast joins: the vocab is <= vocab_size rows BY CONSTRUCTION
    # (and already localCheckpoint'ed / broadcast twice before), so
    # collecting it costs what the broadcast relations already cost,
    # and the corpus-side plan drops two BroadcastHashJoins over the
    # exploded bigram rows.
    vocab_list = [r[0] for r in model.vocab.collect()]

    def _mapped(c: Column) -> Column:
        if not vocab_list:
            return F.lit(UNK)
        return F.when(c.isin(vocab_list), c).otherwise(F.lit(UNK))

    bg = bg.select(key, _mapped(F.col("w1")).alias("w1"),
                   _mapped(F.col("w2")).alias("w2"))
    # Model-side log-prob precompute: per DISTINCT (w1,w2) / w1 the
    # same ln((c12+1)/(c1+V)) the old plan evaluated per exploded
    # corpus row — identical operands, identical doubles, ~10^6x fewer
    # ln calls. Scoring is then one broadcast pair join + one
    # broadcast marginal join + the 1-row unseen fallback (was five
    # joins, with the division+ln per corpus bigram).
    pair_lp = (
        model.bigram.join(F.broadcast(model.marginal), "w1")
        .crossJoin(F.broadcast(model.v_df))
        .select(
            "w1", "w2",
            F.log(
                (F.col("c12") + 1).cast("double")
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("lp12"),
        )
    )
    marg_lp = (
        model.marginal.crossJoin(F.broadcast(model.v_df))
        .select(
            "w1",
            F.log(
                F.lit(1.0)
                / (F.col("c1") + F.col("v")).cast("double")
            ).alias("lp1"),
        )
    )
    unseen_lp = model.v_df.select(
        F.log(F.lit(1.0) / F.col("v").cast("double")).alias("lp0")
    )
    scored = (
        bg.join(F.broadcast(pair_lp), ["w1", "w2"], "left")
        .join(F.broadcast(marg_lp), ["w1"], "left")
        .crossJoin(F.broadcast(unseen_lp))
        .select(key, F.coalesce("lp12", "lp1", "lp0").alias("lp"))
    )
    return scored.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.sum("lp") / F.count(F.lit(1)), 4).alias("avg_logprob"),
    )
