"""Sequence packing: the training-data pipeline's last mile — pack a
curated (doc_id, text) corpus into fixed-token-budget training
sequences (the step after ``chunk_pack``'s within-doc chunking and
``sampling.mix_sources``' corpus mixing).

Semantics: greedy first-fit in doc-hash order. Documents are hashed
into ``n_groups`` independent pack groups (ONE shuffle, on the group
key); within a group they are ordered by (portable doc hash, doc_id)
— fully deterministic, no RNG — and packed left to right: a document
joins the open sequence while the running token total stays within
``budget``, otherwise it opens the next sequence. A document larger
than the budget gets a sequence of its own (``fill_frac > 1`` flags
it). This is the greedy packing used for LLM pretraining corpora
(best-fit-decreasing buys ~1-2 % fill at the cost of a global sort;
the greedy form is what the big pipelines ship).

Scale shape: per-group state is one running total, so each group
streams through its sorted rows once inside ``applyInPandas``; group
count is the parallelism knob (size groups so a group's doc METADATA
— not text — fits an executor; the text column never enters the
shuffle). No driver collect, no global sort, no iterative plan.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from extractthinker_spark.functions.textstats import _round4, count_tokens

PACK_SCHEMA = (
    "pack_group int, seq_id string, doc_ids string, n_docs int, "
    "n_tokens bigint, fill_frac double"
)


def _portable_key_hash(col):
    """md5-derived 60-bit hash of the stringified key — the portable
    hash protocol (NOTES.md #10): DuckDB replays it as
    ('0x' || substring(md5(k), 1, 15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(col.cast("string").cast("binary")), 1, 15),
        16, 10,
    ).cast("long")


def pack_sequences(
    df: DataFrame,
    budget: int,
    key: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_groups: int = 64,
) -> DataFrame:
    """(pack_group, seq_id, doc_ids, n_docs, n_tokens, fill_frac) —
    one row per packed training sequence. ``doc_ids`` is the
    fill-order comma-joined id list; ``fill_frac`` is
    round(n_tokens/budget, 4) (HALF_UP, the cross-engine float
    protocol). With ``tokens_col`` the caller supplies per-doc token
    counts; otherwise ``count_tokens`` (the byte-budget heuristic the
    reference uses for truncation) runs over ``text_col``."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = (
        F.col(tokens_col) if tokens_col is not None
        else count_tokens(F.col(text_col))
    )
    h = _portable_key_hash(F.col(key))
    base = df.select(
        F.col(key).cast("string").alias("_k"),
        toks.cast("long").alias("_tok"),
        h.alias("_h"),
        F.pmod(h, F.lit(n_groups)).cast("int").alias("_g"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "_k"], kind="mergesort")
        g = int(pdf["_g"].iloc[0])
        rows = []
        run = 0
        seq_idx = 0
        ids: list[str] = []
        docs = 0

        def flush():
            if docs:
                rows.append((
                    g, f"{g}-{seq_idx}", ",".join(ids), docs, run,
                    _round4(run / budget),
                ))

        for k, tok in zip(pdf["_k"], pdf["_tok"]):
            tok = int(tok)
            if docs and run + tok > budget:
                flush()
                seq_idx += 1
                run, ids, docs = 0, [], 0
            run += tok
            ids.append(k)
            docs += 1
        flush()
        return pd.DataFrame(
            rows,
            columns=["pack_group", "seq_id", "doc_ids", "n_docs",
                     "n_tokens", "fill_frac"],
        )

    return base.groupBy("_g").applyInPandas(pack, schema=PACK_SCHEMA)


CHOP_SCHEMA = (
    "pack_group int, seq_id string, doc_id string, tok_start bigint, "
    "tok_end bigint, seq_offset bigint"
)


def pack_chop(
    df: DataFrame,
    budget: int,
    key: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    n_groups: int = 64,
) -> DataFrame:
    """Concat-and-chop packing — the GPT-style pretraining shape: the
    group's documents form one token stream in (portable hash, key)
    order and the stream is chopped at exact ``budget`` boundaries, so
    documents SPLIT across sequences instead of staying atomic (every
    sequence except a group's last is exactly full; compare
    :func:`pack_sequences` for the atomic-document greedy variant).

    Output: one row per (document, sequence) overlap — (pack_group,
    seq_id, doc_id, tok_start, tok_end, seq_offset), where
    [tok_start, tok_end) is the doc-relative token slice and
    seq_offset is where it lands inside the sequence. Pure prefix-sum
    math: a window cumsum within each group + one slice-count explode
    — no recursion, no per-group state, one shuffle on the group key
    (the window reuses the groupBy partitioning)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    toks = (
        F.col(tokens_col) if tokens_col is not None
        else count_tokens(F.col(text_col))
    )
    h = _portable_key_hash(F.col(key))
    base = df.select(
        F.col(key).cast("string").alias("_k"),
        toks.cast("long").alias("_tok"),
        h.alias("_h"),
        F.pmod(h, F.lit(n_groups)).cast("int").alias("_g"),
    ).filter(F.col("_tok") > 0)
    w = Window.partitionBy("_g").orderBy("_h", "_k").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = base.withColumn("_off", F.coalesce(F.sum("_tok").over(w),
                                              F.lit(0)))
    # doc [off, off+tok) overlaps sequences floor(off/B) ..
    # floor((off+tok-1)/B); one output row per overlapped sequence.
    # Integer DIV, not float division — a 10^12-doc corpus passes
    # 2^53 total tokens, where double division starts rounding.
    first = F.expr(f"_off DIV {budget}")
    last = F.expr(f"(_off + _tok - 1) DIV {budget}")
    s = F.col("_s")
    return (
        offs.select(
            "_g", "_k", "_tok", "_off",
            F.explode(F.sequence(first, last)).alias("_s"),
        )
        .select(
            F.col("_g").alias("pack_group"),
            F.concat_ws("-", "_g", "_s").alias("seq_id"),
            F.col("_k").alias("doc_id"),
            F.greatest(s * budget - F.col("_off"), F.lit(0))
            .alias("tok_start"),
            F.least((s + 1) * budget - F.col("_off"), F.col("_tok"))
            .alias("tok_end"),
            F.greatest(F.col("_off") - s * budget, F.lit(0))
            .alias("seq_offset"),
        )
    )
