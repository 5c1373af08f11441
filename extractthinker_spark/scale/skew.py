"""Skew handling for mega-documents.

The corpus is skewed *inside rows*: one document can carry a spans
array orders of magnitude larger than the median (SURVEY.md §7.4).
AQE's skew-join splitting cannot see intra-row skew, so the north_rule
demands explicit handling:

  1. ``salt_repartition`` — spread documents across partitions by
     ``xxhash64(doc_id, salt)`` so adjacent ingest order (which
     correlates with size in crawl data) never lands on one executor.
  2. ``subbatch_oversized`` / ``remerge_subbatches`` — split a
     mega-document's spans array into bounded sub-rows so a single
     Arrow batch / task never holds an unbounded payload, process the
     sub-rows like ordinary documents, then re-merge preserving exact
     span order from (sub_id, offset) — order always comes from data,
     never partition order.

Reference contrast: the reference processes one file per Python call
(no skew concept); its nearest analogue is the ≤4-thread OCR pool
(/root/reference/extract_thinker/document_loader/document_loader_tesseract.py:263).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Above this many spans a document is "oversized" and gets sub-batched.
DEFAULT_MAX_SPANS = 256


def salt_repartition(
    df: DataFrame,
    num_partitions: int,
    key: str = "doc_id",
    salt: int = 0,
) -> DataFrame:
    """Repartition on a salted hash of ``key``.

    ``repartition(n, xxhash64(key, salt))`` gives a uniform spread that
    is (a) deterministic for a given salt, (b) re-saltable if one run's
    layout proves pathological, and (c) independent of the upstream
    file layout — exactly the north_rule's "salts and repartitions on
    doc_id hash".
    """
    return df.repartition(
        num_partitions, F.xxhash64(F.col(key), F.lit(salt))
    )


def subbatch_oversized(
    documents: DataFrame, max_spans: int = DEFAULT_MAX_SPANS
) -> DataFrame:
    """Split documents with > ``max_spans`` spans into sub-rows.

    documents(doc_id, spans) → (doc_id, sub_id, n_subs, spans) where
    each output spans array has ≤ max_spans elements and sub_id is the
    0-based slice index. Normal-sized docs pass through as sub_id=0.
    Pure array expressions — no shuffle, no Python.
    """
    n = F.size("spans")
    n_subs = F.greatest(F.ceil(n / F.lit(max_spans)).cast("int"), F.lit(1))
    exploded = documents.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_subs - 1)).alias("sub_id", "_i"),
        n_subs.alias("n_subs"),
        "spans",
    )
    return exploded.select(
        "doc_id",
        "sub_id",
        "n_subs",
        F.slice(
            F.col("spans"),
            F.col("sub_id") * max_spans + 1,
            F.lit(max_spans),
        ).alias("spans"),
    )


def remerge_subbatches(df: DataFrame) -> DataFrame:
    """Inverse of :func:`subbatch_oversized`.

    (doc_id, sub_id, spans) → documents(doc_id, spans) with exact span
    order restored from the stable sub_id (NOT arrival order): sort the
    collected (sub_id, spans) structs, then flatten.
    """
    return (
        df.groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub_id", "spans"))),
                    lambda s: s["spans"],
                )
            ).alias("spans")
        )
    )
