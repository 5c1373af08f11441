"""Reference-shaped API facade: Process/Extractor over DataFrames."""

from __future__ import annotations

import pytest

from extractthinker_spark.api import (
    Classification,
    CompletionStrategy,
    Process,
    SplitStrategy,
    default_classifications,
)
from extractthinker_spark.corpus import corpus_pandas, goldens_pandas
from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

N = 120


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        corpus_pandas(N)[["doc_id", "spans"]], schema=DOCUMENTS_SCHEMA
    ).cache()


def test_lazy_eager_same_groups(docs):
    lazy = Process().load(docs).split(SplitStrategy.LAZY).groups()
    eager = Process().load(docs).split(SplitStrategy.EAGER).groups()
    key = lambda df: {
        (r["doc_id"], r["page_no"]): (r["group_id"], r["classification"])
        for r in df.collect()
    }
    assert key(lazy) == key(eager)


def test_paginate_equals_forbidden_on_scalars(docs):
    """The two completion strategies agree on scalar fields — the
    upgrade of the reference's PAGINATE-vs-FORBIDDEN agreement test
    (tests/test_extractor.py:171-232) to exact equality."""
    def scalars(df):
        return {
            (r["doc_id"], r["group_id"], r["field"]): r["value"]
            for r in df.collect()
            if "_" not in r["field"].rsplit("_", 1)[-1] or
               not r["field"].rsplit("_", 1)[-1].isdigit()
        }

    p = Process().load(docs).split()
    a = scalars(p.extract(CompletionStrategy.PAGINATE))
    b = scalars(p.extract(CompletionStrategy.FORBIDDEN))
    # PAGINATE takes first non-empty per page; FORBIDDEN regexes the
    # joined text — both must find the same first occurrence.
    assert a == b and a


def test_classify_whole_docs_matches_goldens(docs, spark):
    golden = goldens_pandas(N)["expected_classification"]
    got = {
        r["doc_id"]: r["classification"]
        for r in Process().load(docs).classify().collect()
    }
    want = dict(zip(golden["doc_id"], golden["name"]))
    # goldens cover single-class docs; multi-doc bundles classify to
    # their dominant class — compare on the golden subset
    hits = sum(got[k] == v for k, v in want.items() if k in got)
    assert hits >= 0.95 * len(want)


def test_custom_classification_registry(docs):
    classes = [
        Classification(name="Anything", patterns=[r"(?i)[a-z]"]),
    ]
    out = Process(classes).load(docs).classify()
    assert out.filter("classification = 'Anything'").count() == N


def test_default_registry_shape():
    regs = default_classifications()
    assert {c.name for c in regs} >= {"Invoice", "Driver License"}
    inv = next(c for c in regs if c.name == "Invoice")
    assert "invoice_number" in (inv.contract or {})


def test_facade_error_paths(spark):
    import pytest as _pt

    with _pt.raises(ValueError):
        Process().classify()
    with _pt.raises(ValueError):
        Process().extract()
