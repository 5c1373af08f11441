"""Rule-based classification — pure Spark SQL, no UDFs.

The reference classifies by prompting an LLM with every class'
name/description/structure and matching the answer back by normalized
name (extractor.py:722-772), with multi-extractor consensus strategies
layered on top (process.py:95-125) and a tree walk for hierarchies
(process.py:127-188). Here every scorer is a Catalyst expression:

  * keyword scorer — pattern-hit count → confidence 1..10
  * header scorer  — class name in the first line → 10 else 1
  * field scorer   — contract field-regex hit count → confidence

Argmax over the class registry is a fold (``F.aggregate``) over a
literal array of per-class structs — no explode, no shuffle, no
Python. Consensus/threshold strategies are column expressions over N
scorer outputs. The tree walk is a bounded driver loop (tree depth)
of expression applications — still no shuffle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from extractthinker_spark.contracts import (
    CLASS_RULES,
    CONTRACT_FIELDS,
    UNKNOWN,
)

CLASS_RESULT_TYPE = "struct<name:string, confidence:int>"


def _hits(text: Column, patterns: list[str]) -> Column:
    h = F.lit(0)
    for p in patterns:
        h = h + F.when(text.rlike(p), 1).otherwise(0)
    return h


def _confidence(hits: Column) -> Column:
    return F.when(hits <= 0, 1).otherwise(F.least(F.lit(10), hits * 2 + 2))


def _argmax_classes(scored: list[tuple[str, Column]]) -> Column:
    """Argmax of (confidence, name) pairs → best struct<name, confidence>.

    Highest confidence wins; ties break to the lexically smallest name;
    all-zero-hits (confidence 1 everywhere) → Unknown/1.

    Codegen shape: one ``array_max`` over literal-ordered
    ``struct<confidence, rank, name>`` entries — every per-class
    confidence expression appears exactly ONCE in the tree, and
    ArrayMax is a codegen'd loop (no higher-order lambda). Ranks are
    assigned by DESCENDING class name so that confidence ties resolve
    to the lexically smallest name, and a sentinel
    ``(1, max_rank, Unknown)`` entry wins exactly when every class
    scored confidence 1 — the fold's Unknown/1 fallback, with no
    post-fix-up (which would have to re-reference the argmax result
    and re-inline the scorer tree). (The previous ``F.aggregate`` fold
    over an array of structs was a higher-order function: interpreted
    row-at-a-time eval of every scorer expression per fold step. A
    greatest()+when-chain variant re-inlined the greatest() subtree
    per branch and blew past janino's method limits at 3 scorers —
    codegen fell back to interpreted and was slower still.)
    """
    by_name_desc = sorted(scored, key=lambda t: t[0], reverse=True)
    entries = [
        F.struct(
            conf.alias("confidence"),
            F.lit(rank).alias("rank"),
            F.lit(name).alias("name"),
        )
        for rank, (name, conf) in enumerate(by_name_desc)
    ]
    sentinel = F.struct(
        F.lit(1).alias("confidence"),
        F.lit(len(by_name_desc)).alias("rank"),
        F.lit(UNKNOWN).alias("name"),
    )
    m = F.array_max(F.array(*entries, sentinel))
    return F.struct(
        m["name"].alias("name"), m["confidence"].alias("confidence")
    ).cast(CLASS_RESULT_TYPE)


def classify_keyword(text: Column, rules=None) -> Column:
    """struct<name, confidence> from keyword-rule hit counts."""
    rules = rules or CLASS_RULES
    return _argmax_classes(
        [(name, _confidence(_hits(text, pats))) for name, pats in rules]
    )


def classify_header(text: Column, rules=None) -> Column:
    """First-line scorer: class name appears (case-insensitively) in the
    first line → confidence 10."""
    rules = rules or CLASS_RULES
    first_line = F.upper(F.split_part(text, F.lit("\n"), F.lit(1)))
    return _argmax_classes(
        [
            (name, F.when(first_line.contains(name.upper()), 10).otherwise(1))
            for name, _ in rules
        ]
    )


def classify_fields(text: Column, contracts=None) -> Column:
    """Contract-field scorer: how many of the contract's field regexes
    fire → confidence = min(10, 3*hits + 1)."""
    contracts = contracts or CONTRACT_FIELDS
    scored = []
    for name, fields in contracts.items():
        h = _hits(text, list(fields.values()))
        scored.append(
            (name, F.when(h <= 0, 1).otherwise(F.least(F.lit(10), h * 3 + 1)))
        )
    return _argmax_classes(scored)


# ---------------------------------------------------------------------------
# Consensus strategies over N scorer outputs (process.py:95-125 semantics).
# Each takes struct columns and yields struct<name,confidence> or NULL
# (NULL = this layer failed; compose layers with F.coalesce).
# ---------------------------------------------------------------------------

def consensus(*results: Column) -> Column:
    """All scorers agree on the name → the FIRST scorer's result
    (process.py:104-106 returns ``group_classifications[0]``)."""
    names = F.array(*[r["name"] for r in results])
    agree = F.size(F.array_distinct(names)) == 1
    return F.when(agree, results[0])


def higher_order(*results: Column) -> Column:
    """Max-confidence scorer wins; confidence ties keep the EARLIEST
    scorer (process.py:109 ``max(..., key=confidence)`` — Python max
    returns the first maximal element). The comparison struct leads
    with confidence then a negated scorer index, so array_max orders
    by confidence and breaks ties toward index 0."""
    arr = F.array(
        *[
            F.struct(
                r["confidence"].alias("confidence"),
                F.lit(-i).alias("nidx"),
                r["name"].alias("name"),
            )
            for i, r in enumerate(results)
        ]
    )
    m = F.array_max(arr)
    return F.struct(
        m["name"].alias("name"), m["confidence"].alias("confidence")
    ).cast(CLASS_RESULT_TYPE)


def consensus_with_threshold(threshold: int, *results: Column) -> Column:
    """Agree on name AND every confidence >= threshold → the FIRST
    scorer's result (process.py:111-114 returns
    ``group_classifications[0]``)."""
    names = F.array(*[r["name"] for r in results])
    confs = F.array(*[r["confidence"] for r in results])
    ok = (F.size(F.array_distinct(names)) == 1) & (
        F.array_min(confs) >= F.lit(threshold)
    )
    return F.when(ok, results[0])


def layered(*layers: Column) -> Column:
    """Try strategies in order; first non-NULL wins; exhausted →
    Unknown/1 (the reference raises — we keep the row and mark it)."""
    fallback = F.struct(
        F.lit(UNKNOWN).alias("name"), F.lit(1).alias("confidence")
    ).cast(CLASS_RESULT_TYPE)
    return F.coalesce(*layers, fallback)


# ---------------------------------------------------------------------------
# Tree classification (process.py:127-188): level-by-level descent.
# ---------------------------------------------------------------------------

def classify_tree(
    df: DataFrame,
    text_col: str,
    tree: dict,
    threshold: int = 8,
) -> DataFrame:
    """Walk a classification tree level by level.

    ``tree`` = {"nodes": [{"name", "patterns", "children": {...}|None,
    "uuid"?}]}. At each level the keyword scorer runs over that level's
    rules only; descent requires confidence >= threshold. Bounded
    driver loop over tree depth — each step is a pure expression, no
    shuffle, no join (the registry is a literal, i.e. already
    "broadcast").

    Node matching is by ``uuid`` when present (the reference matches
    tree nodes by classification.uuid, process.py:169-181 — names may
    repeat across branches), by name otherwise. tree_path/tree_class
    always carry display NAMES.

    Output: df + tree_path (array<string>), tree_class (leaf name),
    tree_confidence.
    """
    text = F.col(text_col)
    df = df.withColumn("tree_path", F.array().cast("array<string>"))
    df = df.withColumn("tree_class", F.lit(None).cast("string"))
    df = df.withColumn("tree_confidence", F.lit(None).cast("int"))
    df = df.withColumn("_frontier", F.lit("/"))

    # Breadth-first: at each depth, every open frontier classifies among
    # its children. Frontiers are identified by a path string column.
    frontiers = [("/", tree["nodes"])]
    depth = 0
    while frontiers and depth < 16:
        next_frontiers = []
        for path, nodes in frontiers:
            node_key = {id(n): n.get("uuid") or n["name"] for n in nodes}
            rules = [(node_key[id(n)], n["patterns"]) for n in nodes]
            res = classify_keyword(text, rules)
            # uuid -> display-name match-back (chained literal whens)
            disp = F.lit(None).cast("string")
            for n in nodes:
                disp = F.when(
                    res["name"] == node_key[id(n)], F.lit(n["name"])
                ).otherwise(disp)
            at = F.col("_frontier") == path
            passed = at & (res["confidence"] >= threshold) & (res["name"] != UNKNOWN)
            df = (
                df.withColumn(
                    "tree_path",
                    F.when(passed, F.array_append("tree_path", disp))
                    .otherwise(F.col("tree_path")),
                )
                .withColumn(
                    "tree_class",
                    F.when(passed, disp).otherwise(F.col("tree_class")),
                )
                .withColumn(
                    "tree_confidence",
                    F.when(passed, res["confidence"]).otherwise(
                        F.col("tree_confidence")
                    ),
                )
            )
            for n in nodes:
                if n.get("children"):
                    children = n["children"]
                    child_nodes = (
                        children["nodes"] if isinstance(children, dict) else children
                    )
                    # frontier paths are keyed by uuid (when present) so
                    # same-named siblings in different branches cannot
                    # collide — the uuid-match guarantee
                    child_path = path + node_key[id(n)] + "/"
                    df = df.withColumn(
                        "_frontier",
                        F.when(
                            passed & (res["name"] == node_key[id(n)]),
                            F.lit(child_path),
                        ).otherwise(F.col("_frontier")),
                    )
                    next_frontiers.append((child_path, child_nodes))
        frontiers = next_frontiers
        depth += 1
    return df.drop("_frontier")
