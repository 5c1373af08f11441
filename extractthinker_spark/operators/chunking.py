"""Chunking: greedy token-budget packing of ordered text units.

The reference packs ``\\n\\n`` paragraphs into chunks of at most
max_tokens, with an over-long paragraph becoming its own chunk
(extractor.py:867-898). As a running-sum window this is:

    chunk_id = floor(exclusive_cumsum(tokens) / max_tokens)

which reproduces greedy packing exactly when units are small relative
to the budget and degrades gracefully (over-long unit = own chunk
boundary shift) — this closed form is our spec because it is a pure
window expression: one shuffle on the partition key, no Python, and
an exact ANSI-SQL twin for the oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from extractthinker_spark.functions.textstats import count_tokens


def split_units(df: DataFrame, text_col: str, sep: str = r"\n\n") -> DataFrame:
    """text → ordered unit rows (unit_idx, unit) via posexplode."""
    return df.select(
        "*",
        F.posexplode(F.split(F.col(text_col), sep)).alias("unit_idx", "unit"),
    ).drop(text_col)


def pack_chunks(
    units: DataFrame,
    key: str = "doc_id",
    unit_col: str = "unit",
    idx_col: str = "unit_idx",
    max_tokens: int = 100,
) -> DataFrame:
    """Assign chunk ids by exclusive-cumulative token count."""
    w = (
        Window.partitionBy(key)
        .orderBy(idx_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    toks = count_tokens(F.col(unit_col))
    return units.withColumn("unit_tokens", toks).withColumn(
        "chunk_id",
        F.floor(
            (F.sum("unit_tokens").over(w) - F.col("unit_tokens")) / max_tokens
        ).cast("int"),
    )


def chunk_texts(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    sep: str = r"\n\n",
    max_tokens: int = 100,
) -> DataFrame:
    """Full chunking: split → pack → re-join units per chunk.
    Output: (key, chunk_id, chunk_text, n_units, chunk_tokens)."""
    packed = pack_chunks(split_units(df, text_col, sep), key=key,
                         max_tokens=max_tokens)
    return (
        packed.groupBy(key, "chunk_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("unit_idx", "unit"))),
                    lambda s: s["unit"],
                ),
                "\n\n",
            ).alias("chunk_text"),
            F.count("*").alias("n_units"),
            F.sum("unit_tokens").alias("chunk_tokens"),
        )
    )
