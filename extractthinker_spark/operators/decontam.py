"""Benchmark decontamination — flag training documents that collide
with an evaluation set on long word n-grams (the GPT-3 appendix-C /
Llama "13-gram overlap" rule; Brown et al. 2020 §C, Touvron et al.
2023 §5.1). The reference has no decontamination (it extracts, not
curates); this is part of the training-data-pipeline family the
driver brief adds on top of SURVEY §2.

Shape at 100 TB:

  * The benchmark side is SMALL (eval sets are 10^3..10^6 examples →
    at most ~10^7 distinct grams). We distinct it and broadcast it, so
    the corpus side never shuffles its grams: scan → narrow explode →
    BroadcastHashJoin → per-doc partial agg → one hash shuffle keyed
    on doc_id (map-combinable count).
  * The corpus's exploded-gram intermediate is narrow (pipelined into
    the join probe, never materialized or shuffled).
  * If the benchmark outgrows broadcast (~GBs of grams), swap the
    broadcast join for the Bloom pipeline in operators/bloom.py
    (build on bench grams, zero-shuffle literal probe, exact verify
    of positives) — same contract, no O(corpus) shuffle either way.

Tokenization is shared with the n-gram dedup family
(``dedup.word_ngrams``: lowercase, ``[a-z0-9]+`` word regex), so the
DuckDB oracle replays it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from extractthinker_spark.operators.dedup import word_ngrams


def benchmark_grams(
    bench: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct word n-grams of the evaluation set — one column
    ``gram``. Small by construction; callers broadcast it."""
    return (
        bench.select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .filter(F.length("gram") > 0)
        .distinct()
    )


def contamination_hits(
    corpus: DataFrame,
    bench: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
) -> DataFrame:
    """Per-document contamination report: every corpus doc that shares
    at least one word ``n``-gram with the benchmark set.

    Returns (key, hits, top_gram): ``hits`` = number of DISTINCT
    benchmark grams the doc contains, ``top_gram`` = lexicographic min
    of the matched grams (a deterministic sample for audit). Docs with
    zero hits are absent — at web scale contamination is sparse, so
    the report stays tiny.
    """
    grams = F.broadcast(benchmark_grams(bench, bench_text_col, n))
    doc_grams = corpus.select(
        F.col(key).alias(key),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    return (
        doc_grams.join(grams, "gram")
        .groupBy(key)
        .agg(
            # count(*) == count_distinct(gram) here BY CONSTRUCTION:
            # word_ngrams is array_distinct per document and the bench
            # side is distinct'd, so the join emits at most one row
            # per (doc, gram) — dropping count_distinct removes the
            # Expand + extra aggregation pass from the plan.
            F.count(F.lit(1)).alias("hits"),
            F.min("gram").alias("top_gram"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    n: int = 13,
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated documents: corpus rows whose text contains
    >= ``min_hits`` distinct benchmark n-grams are removed (the
    remove-the-training-doc policy; the alternative span-splice policy
    lives in ``dedup.remove_substring_spans``). Anti-join on the key,
    so corpus columns pass through untouched."""
    hits = contamination_hits(corpus, bench, key, text_col, bench_text_col, n)
    flagged = hits.filter(F.col("hits") >= min_hits).select(key)
    # No explicit broadcast hint: contamination is USUALLY sparse, but
    # the flagged set is unbounded (large eval set, small n, or a
    # heavily contaminated corpus), and a forced broadcast of an
    # unbounded side can OOM the driver. AQE sees the real size at
    # runtime and picks broadcast only when it actually fits.
    return corpus.join(flagged, key, "left_anti")
