"""Document splitting: page groups via lazy (window) / eager (grouped).

The reference's lazy splitter asks an LLM ``belongs_to_same_document``
for each consecutive page pair (text_splitter.py:15-72, splitter.py:24-48)
then folds the booleans into groups (splitter.py:50-93). The eager
splitter sends the whole document at once (text_splitter.py:103-154).

Spark-first rebuild:
  * pages come from pdf_text spans (page header convention);
  * the pair judgment is deterministic: pages belong together iff the
    next page classifies to the same class as the current one, OR the
    next page is a continuation (classifies Unknown);
  * LAZY = lag window + running-sum sessionization — pure SQL, one
    shuffle on doc_id (width = pages per doc, never corpus-wide);
  * EAGER = applyInPandas per doc running the same fold on the whole
    page list — required to equal LAZY on every input (the upgrade of
    the reference's PAGINATE-vs-FORBIDDEN agreement tests).
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from extractthinker_spark.contracts import CLASS_RULES, UNKNOWN, confidence_from_hits
from extractthinker_spark.operators.classify import classify_keyword
from extractthinker_spark.operators.parse_core import (
    explode_spans,
    page_number,
    strip_page_header,
)

GROUPS_SCHEMA = (
    "doc_id string, group_id int, pages array<int>, classification string, "
    "confidence int"
)


def pages_from_documents(documents: DataFrame) -> DataFrame:
    """pdf_text spans → (doc_id, page_no, content) page rows."""
    flat = explode_spans(documents).filter(F.col("kind") == "pdf_text")
    return flat.select(
        "doc_id",
        F.coalesce(page_number(F.col("text")), F.col("offset") + 1).alias("page_no"),
        strip_page_header(F.col("text")).alias("content"),
    )


def split_lazy(pages: DataFrame, rules=None) -> DataFrame:
    """Sessionization: boundary where the pair judgment says 'new doc'.

    Returns (doc_id, group_id, pages, classification, confidence),
    group_id 1-based in page order, classification = first non-Unknown
    page class in the group (the reference seeds groups with the pair's
    classification, splitter.py:62-76). ``rules`` = the user's
    Classification registry (name, patterns); default built-ins.
    """
    w = Window.partitionBy("doc_id").orderBy("page_no")
    cls = classify_keyword(F.col("content"), rules)
    scored = pages.select(
        "doc_id", "page_no", "content",
        cls["name"].alias("page_class"),
        cls["confidence"].alias("page_conf"),
    )
    # Compare against the last NAMED class, not the literal previous
    # page: a continuation (Unknown) page must not break a run
    # ([VR, Unknown, VR] is one group — same rule as the eager fold).
    prev_named = F.last(
        F.when(F.col("page_class") != UNKNOWN, F.col("page_class")),
        ignorenulls=True,
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    first = F.row_number().over(w) == 1
    boundary = (
        F.when(first, 1)
        .when(F.col("page_class") == UNKNOWN, 0)
        .when(F.col("page_class") == F.coalesce(prev_named, F.lit("\0")), 0)
        .otherwise(1)
    )
    grouped = scored.withColumn(
        "group_id",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    return (
        grouped.groupBy("doc_id", "group_id")
        .agg(
            F.sort_array(F.collect_list("page_no")).alias("pages"),
            F.coalesce(
                F.min(
                    F.when(
                        F.col("page_class") != UNKNOWN,
                        F.struct("page_no", "page_class"),
                    )
                )["page_class"],
                F.lit(UNKNOWN),
            ).alias("classification"),
            F.max("page_conf").alias("confidence"),
        )
    )


def split_lazy_pages(pages: DataFrame, rules=None) -> DataFrame:
    """Join-free lazy split: page rows annotated with their group.

    Returns (doc_id, group_id, classification, page_no, content) — the
    exact shape of ``group_pages(pages, split_lazy(pages))`` — with ONE
    exchange (on doc_id) instead of three (window + groupBy + join
    back). Trick: within a group every *named* page shares one class by
    construction (a named page with a different class starts a new
    group), so the group's classification is ANY named page's class in
    the group — findable with a backward and a forward window over the
    same doc_id partitioning, no aggregation needed.
    """
    w = Window.partitionBy("doc_id").orderBy("page_no")
    cls = classify_keyword(F.col("content"), rules)
    scored = pages.select(
        "doc_id", "page_no", "content", cls["name"].alias("page_class")
    )
    prev_named = F.last(
        F.when(F.col("page_class") != UNKNOWN, F.col("page_class")),
        ignorenulls=True,
    ).over(w.rowsBetween(Window.unboundedPreceding, -1))
    first = F.row_number().over(w) == 1
    boundary = (
        F.when(first, 1)
        .when(F.col("page_class") == UNKNOWN, 0)
        .when(F.col("page_class") == F.coalesce(prev_named, F.lit("\0")), 0)
        .otherwise(1)
    )
    grouped = scored.withColumn(
        "group_id",
        F.sum(boundary).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("int"),
    )
    named = F.when(
        F.col("page_class") != UNKNOWN,
        F.struct("group_id", F.col("page_class").alias("cls")),
    )
    back = F.last(named, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first(named, ignorenulls=True).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    classification = F.coalesce(
        F.when(back["group_id"] == F.col("group_id"), back["cls"]),
        F.when(fwd["group_id"] == F.col("group_id"), fwd["cls"]),
        F.lit(UNKNOWN),
    )
    return grouped.select(
        "doc_id", "group_id", classification.alias("classification"),
        "page_no", "content",
    )


# Shared pure-python pair judgment — used by the eager path and unit
# tests, required to agree with the SQL expressions above.
_COMPILED_RULES = [
    (name, [re.compile(p) for p in pats]) for name, pats in CLASS_RULES
]


def classify_text_py(text: str, compiled=None) -> tuple[str, int]:
    best = (UNKNOWN, 1)
    for name, pats in (compiled if compiled is not None else _COMPILED_RULES):
        hits = sum(1 for p in pats if p.search(text or ""))
        conf = confidence_from_hits(hits)
        if conf > best[1] and hits > 0:
            best = (name, conf)
        elif conf == best[1] and hits > 0 and best[0] != UNKNOWN and name < best[0]:
            best = (name, conf)
    return best


def split_eager(pages: DataFrame, rules=None) -> DataFrame:
    """Whole-document grouping in one grouped-apply per doc.

    Same fold as the reference's aggregate_doc_groups
    (splitter.py:50-93) with the deterministic pair judgment. One
    Arrow batch per document; output identical to split_lazy.
    """
    compiled = (
        None
        if rules is None
        else [(name, [re.compile(p) for p in pats]) for name, pats in rules]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("page_no")
        out = []
        cur_pages: list[int] = []
        cur_cls: list[tuple[str, int]] = []
        gid = 0

        def close():
            nonlocal cur_pages, cur_cls
            if cur_pages:
                named = [c for c in cur_cls if c[0] != UNKNOWN]
                cls = named[0][0] if named else UNKNOWN
                conf = max(c[1] for c in cur_cls)
                out.append(
                    (pdf["doc_id"].iloc[0], gid, cur_pages, cls, conf)
                )
            cur_pages, cur_cls = [], []

        prev_name = None
        for row in pdf.itertuples():
            name, conf = classify_text_py(row.content, compiled)
            belongs = prev_name is not None and (
                name == prev_name or name == UNKNOWN
            )
            if not belongs:
                close()
                gid += 1
            cur_pages.append(int(row.page_no))
            cur_cls.append((name, conf))
            if name != UNKNOWN:
                prev_name = name
            elif prev_name is None:
                prev_name = name
        close()
        return pd.DataFrame(
            out,
            columns=["doc_id", "group_id", "pages", "classification", "confidence"],
        )

    return pages.groupBy("doc_id").applyInPandas(fold, schema=GROUPS_SCHEMA)


def group_pages(pages: DataFrame, groups: DataFrame) -> DataFrame:
    """Join page rows back to their group (doc_id equi-join + membership)
    → (doc_id, group_id, classification, page_no, content)."""
    g = groups.select(
        "doc_id", "group_id", "classification", F.explode("pages").alias("page_no")
    )
    return g.join(pages, ["doc_id", "page_no"]).select(
        "doc_id", "group_id", "classification", "page_no", "content"
    )
