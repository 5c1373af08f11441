"""Splitting: golden groups + lazy/eager strategy equivalence."""

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.corpus import corpus_pandas, goldens_pandas
from extractthinker_spark.operators.split import (
    group_pages,
    pages_from_documents,
    split_eager,
    split_lazy,
)
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

N_DOCS = 200


@pytest.fixture(scope="module")
def pages(spark):
    docs = spark.createDataFrame(
        corpus_pandas(N_DOCS)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    )
    return pages_from_documents(docs).cache()


def _collect_groups(df):
    return {
        (r["doc_id"], r["group_id"]): (tuple(r["pages"]), r["classification"])
        for r in df.collect()
    }


def test_lazy_matches_goldens(pages):
    golden = goldens_pandas(N_DOCS)["expected_groups"]
    got = _collect_groups(split_lazy(pages))
    assert len(got) == len(golden)
    for row in golden.itertuples():
        key = (row.doc_id, row.group_id)
        assert key in got, key
        assert got[key] == (tuple(row.pages), row.classification), (key, got[key])


def test_eager_equals_lazy(pages):
    lazy = _collect_groups(split_lazy(pages))
    eager = _collect_groups(split_eager(pages))
    assert lazy == eager


def test_unknown_continuation_run(spark):
    # [VR, Unknown, VR] must be ONE group under both strategies.
    rows = [
        ("x", 1, "VEHICLE REGISTRATION\nName Primary: A\nVehicle Type: VAN"),
        ("x", 2, "continuation page with no signals"),
        ("x", 3, "Vehicle Color: RED\nPlate: AAA-0001"),
        ("x", 4, "DRIVER LICENSE\nName: B\nAge: 30\nLicense No: 12345"),
    ]
    pages = spark.createDataFrame(rows, ["doc_id", "page_no", "content"])
    lazy = _collect_groups(split_lazy(pages))
    eager = _collect_groups(split_eager(pages))
    assert lazy == eager
    assert lazy[("x", 1)] == ((1, 2, 3), "Vehicle Registration")
    assert lazy[("x", 2)] == ((4,), "Driver License")


def test_unknown_first_page(spark):
    rows = [
        ("y", 1, "no signals at all"),
        ("y", 2, "Invoice #1\nDate: 1/1/11\nA 1 x 2 = 2\nTotal: 2"),
    ]
    pages = spark.createDataFrame(rows, ["doc_id", "page_no", "content"])
    lazy = _collect_groups(split_lazy(pages))
    eager = _collect_groups(split_eager(pages))
    assert lazy == eager
    assert lazy[("y", 1)] == ((1,), "Unknown")
    assert lazy[("y", 2)][1] == "Invoice"


def test_group_pages_projection(pages):
    groups = split_lazy(pages)
    gp = group_pages(pages, groups)
    # every page lands in exactly one group
    assert gp.count() == pages.count()
    assert gp.groupBy("doc_id", "page_no").count().filter("count > 1").count() == 0


def test_lazy_pages_equals_group_join(pages):
    """The join-free split_lazy_pages must equal the
    group_pages(split_lazy(...)) composition row-for-row."""
    from extractthinker_spark.operators.split import split_lazy_pages

    a = {
        (r["doc_id"], r["page_no"]): (r["group_id"], r["classification"])
        for r in split_lazy_pages(pages).collect()
    }
    b = {
        (r["doc_id"], r["page_no"]): (r["group_id"], r["classification"])
        for r in group_pages(pages, split_lazy(pages)).collect()
    }
    assert a == b
