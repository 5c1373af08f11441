"""Deterministic corpus sampling, splitting and source mixing.

The curation counterpart to the dedup/gate families: once a corpus is
cleaned, a training run needs (a) reproducible subsamples ("5 % of the
web crawl"), (b) leak-proof train/heldout splits, and (c) weighted
source mixing ("2.5 epochs of books, 0.5 of crawl" — the Pile/LLaMA
recipe shape). All three must be DETERMINISTIC functions of the
document key, never of partitioning, executor count or RNG state —
re-running the job, at any cluster size, must keep exactly the same
documents (the two-cluster-size scaling rule makes this a correctness
property, not a convenience).

Everything here is a narrow map: hash the key, compare against a
precomputed integer threshold. No shuffle, no sort, no RNG, no
``TABLESAMPLE`` (Spark's is partition-dependent). The hash is the
md5-portable scheme the dedup family uses (NOTES.md: top 15 hex
nibbles stay under 2^63 and match DuckDB's ``('0x'||hex)::BIGINT``),
so every operator has an exact cross-engine oracle.

The reference scopes sampling out entirely (its pipelines are
per-document LLM calls); this family is brief-mandated LLM-pipeline
tooling, like dedup/quality-gates.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: one above the largest value of the 15-nibble hash → exclusive bound
PORTABLE_MOD = 16 ** 15


def portable_unit_hash(key: Column, seed: str) -> Column:
    """Deterministic uniform integer in [0, 16^15): md5 over
    ``key|seed`` UTF-8 bytes, top 15 hex nibbles as a long. Changing
    ``seed`` draws an independent sample; the same (key, seed) pair
    hashes identically in Spark and DuckDB."""
    h = F.md5(F.concat(key.cast("string"), F.lit("|" + seed)).cast("binary"))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return int(rate * PORTABLE_MOD)


def hash_sample(
    df: DataFrame, rate: float, key: str = "doc_id", seed: str = "sample"
) -> DataFrame:
    """Keep each row independently with probability ``rate``,
    deterministically in ``key``: keep iff hash(key|seed) < rate·2^60.
    Unlike ``DataFrame.sample`` this is stable across partitioning,
    retries and cluster sizes, and composable (different seeds give
    independent draws; the same seed at a larger rate gives a strict
    SUPERSET — handy for growing a sample without resampling)."""
    return df.filter(
        portable_unit_hash(F.col(key), seed) < F.lit(_threshold(rate))
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    key: str = "doc_id",
    seed: str = "sample",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic Bernoulli: stratum s keeps its rows
    at ``rates[s]`` (strata absent from ``rates`` use
    ``default_rate``). One narrow filter — the per-stratum thresholds
    fold into a single CASE expression, so this costs the same as the
    flat sample regardless of strata count."""
    thr = None
    for s, r in sorted(rates.items()):
        c = F.col(stratum_col) == s
        thr = F.when(c, _threshold(r)) if thr is None else thr.when(
            c, _threshold(r)
        )
    thr = (
        F.lit(_threshold(default_rate))
        if thr is None
        else thr.otherwise(_threshold(default_rate))
    )
    return df.filter(portable_unit_hash(F.col(key), seed) < thr)


def split_train_heldout(
    df: DataFrame,
    heldout_frac: float,
    key: str = "doc_id",
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Leak-proof deterministic split: adds ``out_col`` =
    'heldout' | 'train' by key hash. A document lands on the same side
    in every run and every pipeline stage — the property that actually
    prevents train/test contamination at corpus scale (sampling split
    membership per-run does not)."""
    return df.withColumn(
        out_col,
        F.when(
            portable_unit_hash(F.col(key), seed)
            < F.lit(_threshold(heldout_frac)),
            "heldout",
        ).otherwise("train"),
    )


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key: str = "doc_id",
    seed: str = "mix",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Weighted source mixing (the training-mixture recipe): a source
    with weight w contributes ⌊w⌋ full epochs of its documents plus a
    deterministic hash-sampled (w − ⌊w⌋) fraction — so w = 2.5 means
    every document twice and half the documents (chosen by key hash) a
    third time; w = 0.5 downsamples to half an epoch. Sources absent
    from ``weights`` get w = 0 (dropped).

    Output: input rows replicated with an ``epoch_col`` index
    (0-based) — the downstream writer can partition by epoch or
    interleave on it. Narrow map + explode, no shuffle; output volume
    is Σ w_s·|s|, exactly what a mixture run must read anyway.
    """
    full = None
    fthr = None
    for s, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"weight must be >= 0, got {w} for {s!r}")
        c = F.col(source_col) == s
        fl, fr = int(w), _threshold(w - int(w))
        full = F.when(c, fl) if full is None else full.when(c, fl)
        fthr = F.when(c, fr) if fthr is None else fthr.when(c, fr)
    if full is None:
        full, fthr = F.lit(0), F.lit(0)
    else:
        full, fthr = full.otherwise(0), fthr.otherwise(0)
    n = full + F.when(
        portable_unit_hash(F.col(key), seed) < fthr, 1
    ).otherwise(0)
    return (
        df.withColumn("_n_copies", n)
        .filter(F.col("_n_copies") > 0)
        .withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1)),
        )
        .drop("_n_copies")
    )
