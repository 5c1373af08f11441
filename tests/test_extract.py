"""Contract extraction: golden fields + paginate/whole-doc equivalence."""

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.corpus import corpus_pandas, goldens_pandas
from extractthinker_spark.operators.classify import classify_keyword
from extractthinker_spark.operators.extract import (
    extract_fields,
    fields_to_struct,
    paginate_extract,
)
from extractthinker_spark.operators.split import (
    group_pages,
    pages_from_documents,
    split_lazy,
)
from extractthinker_spark.plans.pipeline import doc_text, extract_main_content
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

N_DOCS = 200


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        corpus_pandas(N_DOCS)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    ).cache()


@pytest.fixture(scope="module")
def classified(docs):
    dt = doc_text(extract_main_content(docs))
    return dt.select(
        "doc_id", "content",
        classify_keyword(F.col("content"))["name"].alias("classification"),
    ).cache()


def _expected_for(golden, doc_ids=None):
    exp = {}
    for row in golden.itertuples():
        if doc_ids is None or row.doc_id in doc_ids:
            exp[(row.doc_id, row.contract, row.field)] = row.value
    return exp


def test_extract_matches_goldens_single_doc_archetypes(classified):
    golden = goldens_pandas(N_DOCS)["expected_fields"]
    # single-span archetypes: everything except bulk_multi/gdp (pdf docs)
    pdf_docs = {d for d in golden.doc_id if 65 <= int(d[4:]) % 100 < 85}
    exp = _expected_for(golden, doc_ids=set(golden.doc_id) - pdf_docs)
    out = extract_fields(classified)
    got = {
        (r["doc_id"], r["contract"], r["field"]): r["value"]
        for r in out.collect()
        if r["doc_id"] not in pdf_docs
    }
    assert got == exp


def test_paginate_matches_goldens_pdf_docs(docs):
    golden = goldens_pandas(N_DOCS)["expected_fields"]
    pdf_docs = {d for d in set(golden.doc_id) if 65 <= int(d[4:]) % 100 < 85}
    exp = _expected_for(golden, doc_ids=pdf_docs)
    pages = pages_from_documents(docs)
    grouped = group_pages(pages, split_lazy(pages))
    out = paginate_extract(grouped, keys=["doc_id"])
    got = {
        (r["doc_id"], r["contract"], r["field"]): r["value"]
        for r in out.collect()
    }
    assert got == exp


def test_paginate_equals_whole_doc_on_gdp(docs):
    """Strategy equivalence (reference: PAGINATE vs FORBIDDEN must agree,
    tests/test_extractor.py:171-232 — upgraded to exact equality)."""
    gdp_ids = [f"doc_{i:06d}" for i in range(N_DOCS) if 75 <= i % 100 < 85]
    pages = pages_from_documents(docs).filter(F.col("doc_id").isin(gdp_ids))
    grouped = group_pages(pages, split_lazy(pages))
    via_pages = paginate_extract(grouped, keys=["doc_id"])

    whole = (
        pages.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("page_no", "content"))),
                    lambda s: s["content"],
                ),
                "\n\n",
            ).alias("content")
        )
        .withColumn("classification",
                    classify_keyword(F.col("content"))["name"])
    )
    via_whole = extract_fields(whole)

    a = {(r["doc_id"], r["field"]): r["value"] for r in via_pages.collect()}
    b = {(r["doc_id"], r["field"]): r["value"] for r in via_whole.collect()}
    assert a == b


def test_fields_to_struct_pivot(classified):
    inv = extract_fields(classified.filter("classification = 'Invoice'"))
    wide = fields_to_struct(inv, ["invoice_number", "invoice_date", "total_amount"])
    row = wide.filter("doc_id = 'doc_000000'").collect()[0]
    assert row["invoice_number"] is not None
    assert row["total_amount"] is not None
