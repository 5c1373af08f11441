"""TF-IDF keyword extraction — top-k distinguishing terms per
document (corpus curation: domain profiling, topic clustering keys,
stop-phrase discovery). The reference has no corpus-level text
analytics; this extends the driver brief's text-analysis family.

Scale shape:

  * Document frequencies are ONE map-combinable groupBy over distinct
    (doc, term) pairs; ``min_df``/``max_df_frac`` prune the long tail
    and boilerplate head so the idf table stays broadcastable.
  * N (corpus size) rides along as a broadcast 1-row aggregate — no
    plan-time count job.
  * Term scores join tf (narrow explode) against the BROADCAST idf
    table; the per-doc top-k uses `row_number() <= k`, which Catalyst
    executes with a partial WindowGroupLimit BELOW the exchange
    (NOTES.md) — each map task ships at most k rows per doc.

Cross-engine float protocol: tf is an integer, idf = ln(N/df) is one
division + one ln; the ORDER key is round(tf*idf, 4) — rounding before
ranking makes mathematical ties (e.g. 2·ln4 vs 4·ln2) exact ties in
both engines, broken by term ASC.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from extractthinker_spark.functions.lm import _words


def term_counts(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """(key, term, tf) — per-document term frequencies; the explode is
    narrow, the groupBy is map-combinable on (key, term)."""
    return (
        df.select(F.col(key).alias(key),
                  F.explode(_words(F.col(text_col))).alias("term"))
        .groupBy(key, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def document_frequencies(
    tc: DataFrame, key: str, min_df: int = 1, max_df_frac: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """(idf table, 1-row N table) from a term_counts frame. Terms in
    fewer than ``min_df`` docs or more than ``max_df_frac`` of the
    corpus are dropped (rare-noise / boilerplate pruning — what keeps
    the broadcast side small at web scale)."""
    n_df = tc.select(key).distinct().agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    dfreq = (
        dfreq.crossJoin(F.broadcast(n_df))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.col("n_docs") * max_df_frac)
        )
        .select("term", "df", "n_docs")
    )
    return dfreq, n_df


def tfidf_top_terms(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 1,
    max_df_frac: float = 1.0,
) -> DataFrame:
    """Top-``k`` terms per document by tf·idf. Returns
    (key, term, tf, score, rank) with rank 1..k; the rank order key is
    round(tf·ln(N/df), 4) DESC, term ASC (deterministic and
    engine-replayable)."""
    tc = term_counts(df, key, text_col)
    dfreq, _ = document_frequencies(tc, key, min_df, max_df_frac)
    scored = tc.join(F.broadcast(dfreq), "term").select(
        key,
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
            4,
        ).alias("score"),
    )
    w = Window.partitionBy(key).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
