"""Contract field extraction + pagination merge — pure Spark SQL.

Replaces the reference's LLM extraction (extractor.py:193-335) with the
contract registry's deterministic field regexes, and the PAGINATE
completion strategy (pagination_handler.py:28-142) with a partial+final
aggregation:

  * per-page partial extraction (all fields optional — empty string when
    a page lacks the field, mirroring utils.py:247-266 optionalization);
  * scalar merge: first non-empty value in page order — the
    deterministic stand-in for the reference's first-distinct-wins rule
    (pagination_handler.py:107-129);
  * list merge: entries deduped by value keeping first occurrence
    (merge-by-candidate-key, pagination_handler.py:144-204), then
    re-indexed globally by (page_no, position).

Output is long format (doc_id, contract, field, value) so arbitrary
contracts share one schema; pivot to a typed struct per contract with
``fields_to_struct`` when needed.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from extractthinker_spark.contracts import CONTRACT_FIELDS, CONTRACT_LIST_FIELDS


def _scalar_entries(
    text: Column, contract: Column, registry: dict[str, dict[str, str]] | None = None
) -> Column:
    """array<struct<field,value>> of scalar-field extractions for the
    row's contract — a literal when-chain over the registry (the
    registry is tiny; this is the broadcast-dimension pattern).
    ``registry`` defaults to the built-in CONTRACT_FIELDS; the API layer
    passes the user's Classification registry here (the reference picks
    extraction_contract or contract per group, process.py:249-262)."""
    registry = registry if registry is not None else CONTRACT_FIELDS
    result = F.lit(None).cast("array<struct<field:string,value:string>>")
    expr = None
    for name, fields in registry.items():
        arr = F.array(
            *[
                F.struct(
                    F.lit(fld).alias("field"),
                    F.regexp_extract(text, pat, 1).alias("value"),
                )
                for fld, pat in fields.items()
            ]
        )
        expr = F.when(contract == name, arr) if expr is None else expr.when(
            contract == name, arr
        )
    return expr.otherwise(result) if expr is not None else result


def extract_scalar_fields(
    df: DataFrame,
    text_col: str = "content",
    contract_col: str = "classification",
    keys: list[str] | None = None,
    contracts: dict[str, dict[str, str]] | None = None,
) -> DataFrame:
    """Long-format scalar extraction: one row per (doc, field) with a
    non-empty value. ``keys`` are carried through (default doc_id)."""
    keys = keys or ["doc_id"]
    entries = _scalar_entries(F.col(text_col), F.col(contract_col), contracts)
    out = df.select(
        *keys,
        F.col(contract_col).alias("contract"),
        F.explode(entries).alias("e"),
    ).select(*keys, "contract", F.col("e.field").alias("field"),
             F.col("e.value").alias("value"))
    return out.filter(F.col("value") != "")


def _list_entries(
    text: Column, contract: Column, registry: dict[str, dict[str, str]] | None = None
) -> Column:
    """array<struct<field,pos,value>> of list-field extractions."""
    registry = registry if registry is not None else CONTRACT_LIST_FIELDS
    typ = "array<struct<field:string,pos:int,value:string>>"

    def entry_fn(fld):
        return lambda v, i: F.struct(
            F.lit(fld).alias("field"),
            i.cast("int").alias("pos"),
            v.alias("value"),
        )

    expr = None
    for name, fields in registry.items():
        per_field = [
            F.transform(
                F.regexp_extract_all(text, F.lit(pat), F.lit(1)), entry_fn(fld)
            )
            for fld, pat in fields.items()
        ]
        arr = F.flatten(F.array(*per_field)) if len(per_field) > 1 else per_field[0]
        expr = F.when(contract == name, arr) if expr is None else expr.when(
            contract == name, arr
        )
    empty = F.lit(None).cast(typ)
    return expr.otherwise(empty) if expr is not None else empty


def extract_list_fields(
    df: DataFrame,
    text_col: str = "content",
    contract_col: str = "classification",
    keys: list[str] | None = None,
    list_contracts: dict[str, dict[str, str]] | None = None,
) -> DataFrame:
    """Long-format list extraction: field names get a global index
    suffix (``country_0``, ``country_1``, …) ordered by occurrence."""
    keys = keys or ["doc_id"]
    entries = _list_entries(F.col(text_col), F.col(contract_col), list_contracts)
    flat = df.select(
        *keys,
        F.col(contract_col).alias("contract"),
        F.explode(entries).alias("e"),
    ).select(*keys, "contract", F.col("e.field").alias("base"),
             F.col("e.pos").alias("pos"), F.col("e.value").alias("value"))
    w = Window.partitionBy(*keys, "contract", "base").orderBy("pos")
    return flat.select(
        *keys, "contract",
        F.concat(F.col("base"), F.lit("_"), (F.row_number().over(w) - 1)).alias("field"),
        "value",
    )


def extract_fields(
    df: DataFrame,
    text_col: str = "content",
    contract_col: str = "classification",
    keys: list[str] | None = None,
    contracts: dict[str, dict[str, str]] | None = None,
    list_contracts: dict[str, dict[str, str]] | None = None,
) -> DataFrame:
    """Scalars ∪ lists (unionByName)."""
    return extract_scalar_fields(
        df, text_col, contract_col, keys, contracts
    ).unionByName(
        extract_list_fields(df, text_col, contract_col, keys, list_contracts)
    )


# ---------------------------------------------------------------------------
# Pagination merge: per-page partials → document-level fields.
# ---------------------------------------------------------------------------

def paginate_extract(
    pages: DataFrame,
    text_col: str = "content",
    contract_col: str = "classification",
    keys: list[str] | None = None,
    contracts: dict[str, dict[str, str]] | None = None,
    list_contracts: dict[str, dict[str, str]] | None = None,
) -> DataFrame:
    """PAGINATE strategy: extract per page, merge per document.

    ``pages`` must carry ``page_no``. Merge rules (deterministic
    versions of pagination_handler.py:84-223):
      scalars — first non-empty value in page order wins;
      lists   — dedupe by value keeping first (page_no, pos), then
                re-index globally.

    One pass: a scalar IS a list whose merge keeps only index 0 (dedup
    by value in page order makes index 0 the first non-empty value), so
    scalar and list entries ride a single explode + two windows. The
    two-branch formulation scanned the pages input twice and shuffled
    three times — at corpus scale the extra full scan dominates.
    """
    keys = keys or ["doc_id"]
    entry_t = "array<struct<base:string,pos:int,value:string,is_scalar:boolean>>"
    scal = F.transform(
        _scalar_entries(F.col(text_col), F.col(contract_col), contracts),
        lambda s: F.struct(
            s["field"].alias("base"),
            F.lit(-1).alias("pos"),
            s["value"].alias("value"),
            F.lit(True).alias("is_scalar"),
        ),
    )
    lst = F.transform(
        _list_entries(F.col(text_col), F.col(contract_col), list_contracts),
        lambda s: F.struct(
            s["field"].alias("base"),
            s["pos"].alias("pos"),
            s["value"].alias("value"),
            F.lit(False).alias("is_scalar"),
        ),
    )
    empty = F.array().cast(entry_t)
    entries = F.concat(
        F.coalesce(scal.cast(entry_t), empty), F.coalesce(lst.cast(entry_t), empty)
    )
    flat = pages.select(
        *keys, "page_no",
        F.col(contract_col).alias("contract"),
        F.explode(entries).alias("e"),
    ).select(
        *keys, "page_no", "contract",
        F.col("e.base").alias("base"), F.col("e.pos").alias("pos"),
        F.col("e.value").alias("value"), F.col("e.is_scalar").alias("is_scalar"),
    ).filter(F.col("value") != "")
    # merge-by-key: first occurrence of each distinct value survives
    dedup_w = Window.partitionBy(
        *keys, "contract", "is_scalar", "base", "value"
    ).orderBy("page_no", "pos")
    firsts = flat.withColumn("rn", F.row_number().over(dedup_w)).filter("rn = 1")
    idx_w = Window.partitionBy(*keys, "contract", "is_scalar", "base").orderBy(
        "page_no", "pos"
    )
    indexed = firsts.withColumn("idx", F.row_number().over(idx_w) - 1)
    return indexed.filter(~F.col("is_scalar") | (F.col("idx") == 0)).select(
        *keys, "contract",
        F.when(F.col("is_scalar"), F.col("base")).otherwise(
            F.concat(F.col("base"), F.lit("_"), F.col("idx"))
        ).alias("field"),
        "value",
    )


def fields_to_struct(long_df: DataFrame, fields: list[str]) -> DataFrame:
    """Pivot long format → one row per doc with a named column per field
    (the typed-contract projection)."""
    return (
        long_df.groupBy("doc_id", "contract")
        .pivot("field", fields)
        .agg(F.first("value"))
    )
