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


def test_custom_registry_threads_through_split_extract(docs):
    """Process(custom).split().extract() must classify AND extract with
    the user registry, never the built-ins (the reference's dummy-object
    plumbing test, tests/test_process.py:173-264). The custom class
    matches every invoice page by its own pattern and extracts a field
    the built-in registry does not know."""
    classes = [
        Classification(
            name="CustomDoc",
            patterns=[r"(?i)vehicle registration", r"(?i)driver license"],
            contract={"custom_license": r"License No: (\d+)"},
        ),
    ]
    p = Process(classes).load(docs).split(SplitStrategy.LAZY)
    groups = p.groups()
    names = {r["classification"] for r in groups.collect()}
    assert "CustomDoc" in names
    assert not names & {"Invoice", "Driver License", "Vehicle Registration"}

    fields = p.extract(CompletionStrategy.PAGINATE)
    got = {r["field"] for r in fields.collect()}
    assert got == {"custom_license"}
    # FORBIDDEN path threads the registry too
    got_f = {r["field"] for r in p.extract(CompletionStrategy.FORBIDDEN).collect()}
    assert got_f == {"custom_license"}
    # eager split agrees with lazy under the custom registry
    eager = Process(classes).load(docs).split(SplitStrategy.EAGER).groups()
    key = lambda df: {
        (r["doc_id"], r["page_no"]): (r["group_id"], r["classification"])
        for r in df.collect()
    }
    assert key(eager) == key(groups)


def test_extraction_contract_precedence(docs):
    """extraction_contract beats contract at extraction time
    (process.py:249-262)."""
    classes = [
        Classification(
            name="CustomDoc",
            patterns=[r"(?i)vehicle registration", r"(?i)driver license"],
            contract={"wrong_field": r"Plate: ([^\n]+)"},
            extraction_contract={"right_field": r"License No: (\d+)"},
        ),
    ]
    p = Process(classes).load(docs).split()
    got = {r["field"] for r in p.extract(CompletionStrategy.PAGINATE).collect()}
    assert got == {"right_field"}


def test_tree_uuid_matching(spark):
    """Same-named leaves under different branches resolve via uuid
    (process.py:169-181): descent paths cannot collide."""
    import pyspark.sql.functions as F

    from extractthinker_spark.operators.classify import classify_tree

    tree = {
        "nodes": [
            {
                "name": "Finance", "patterns": [r"(?i)invoice"],
                "uuid": "u-fin",
                "children": [
                    {"name": "Detail", "patterns": [r"(?i)total"],
                     "uuid": "u-fin-detail", "children": None},
                ],
            },
            {
                "name": "Identity", "patterns": [r"(?i)license"],
                "uuid": "u-id",
                "children": [
                    {"name": "Detail", "patterns": [r"(?i)age"],
                     "uuid": "u-id-detail", "children": None},
                ],
            },
        ]
    }
    df = spark.createDataFrame(
        [(1, "Invoice # Total: 12"), (2, "License Age: 44")], "id int, t string"
    )
    out = {
        r["id"]: (r["tree_path"], r["tree_class"])
        for r in classify_tree(df, "t", tree, threshold=1).collect()
    }
    assert out[1] == (["Finance", "Detail"], "Detail")
    assert out[2] == (["Identity", "Detail"], "Detail")


def test_facade_error_paths(spark):
    import pytest as _pt

    with _pt.raises(ValueError):
        Process().classify()
    with _pt.raises(ValueError):
        Process().extract()


def test_load_raw_pipeline(spark):
    """Raw binary corpus -> sniff/decode -> split -> extract, through
    the facade (the reference's file-path entry, Spark-native)."""
    from extractthinker_spark.operators.rawbytes import make_fixture_pdf

    pages = [
        "VEHICLE REGISTRATION\nName Primary: A B\nPlate: XYZ-1",
        "DRIVER LICENSE\nName: B, C\nAge: 41\nLicense No: 123",
    ]
    raw = spark.createDataFrame(
        [("r1", make_fixture_pdf(pages))], "doc_id string, raw binary"
    )
    p = Process().load_raw(raw).split(SplitStrategy.LAZY)
    got = {
        (r["doc_id"], r["page_no"]): r["classification"]
        for r in p.groups().collect()
    }
    assert got == {
        ("r1", 1): "Vehicle Registration",
        ("r1", 2): "Driver License",
    }
    fields = {
        (r["field"]): r["value"]
        for r in p.extract(CompletionStrategy.PAGINATE).collect()
    }
    assert fields["license_number"] == "123" and fields["plate"] == "XYZ-1"


def test_classify_strategies_with_layers(docs):
    """process.py:81-125 facade parity: layers of extractors gated by
    CONSENSUS / HIGHER_ORDER / CONSENSUS_WITH_THRESHOLD, falling
    through layers in order."""
    from extractthinker_spark.api import ClassificationStrategy, Extractor

    kw = Extractor(scorer="keyword")
    hd = Extractor(scorer="header")
    fl = Extractor(scorer="fields")
    p = (
        Process()
        .load(docs)
        .add_classify_extractor([[kw, hd, fl], [kw]])
    )
    base = {
        r["doc_id"]: r["classification"]
        for r in Process().load(docs).classify().collect()
    }

    ho = {
        r["doc_id"]: r["classification"]
        for r in p.classify(strategy=ClassificationStrategy.HIGHER_ORDER).collect()
    }
    assert set(ho) == set(base) and ho

    cs = p.classify(strategy=ClassificationStrategy.CONSENSUS).collect()
    # consensus rows either agree with the single-scorer answer or fell
    # through to the keyword-only layer 2 (== base), never something new
    assert all(r["classification"] == base[r["doc_id"]] or
               r["classification"] == "Unknown" for r in cs)
    agree = sum(r["classification"] == base[r["doc_id"]] for r in cs)
    assert agree >= 0.5 * len(cs)

    th = p.classify(
        strategy=ClassificationStrategy.CONSENSUS_WITH_THRESHOLD, threshold=10
    ).collect()
    # an impossible threshold on layer 1 falls through to layer 2
    # (single scorer consensus with itself still needs conf >= 10), so
    # some rows resolve and low-confidence ones come back Unknown
    names = {r["classification"] for r in th}
    assert names  # runs; gate semantics pinned in tests/test_classify.py


def test_process_filter_quality(spark):
    """Process.filter_quality drops failing documents using the Gopher
    gate over stripped content; survivors flow on unchanged."""
    from extractthinker_spark.api import Process

    good = ("the quick brown fox jumps over the lazy dog and then keeps "
            "running through the wide open field for a while until it "
            "finds a quiet place to rest near the river")
    rows = [
        ("g", [("text", good, None, 0)]),
        ("tiny", [("text", "too short", None, 0)]),
    ]
    docs = spark.createDataFrame(
        [(d, [{"kind": k, "text": t, "media_ref": m, "offset": o}
              for k, t, m, o in sp]) for d, sp in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    p = Process().load(docs).filter_quality(thresholds={"min_words": 10})
    kept = {r["doc_id"] for r in p.extract_content().select("doc_id").collect()}
    assert kept == {"g"}
    # keep_rejects leaves the corpus intact but stashes the verdict
    p2 = Process().load(docs).filter_quality(
        thresholds={"min_words": 10}, keep_rejects=True
    )
    assert p2.extract_content().count() == 2
    report = {
        r["doc_id"]: (r["keep"], r["reject_reason"])
        for r in p2.quality_report.collect()
    }
    assert report["g"] == (True, None)
    assert report["tiny"] == (False, "too_few_words")


def test_process_scrub_pii(spark):
    """Process.scrub_pii redacts text-bearing spans in place; span
    structure, kinds, refs, offsets survive untouched."""
    from extractthinker_spark.api import Process

    rows = [
        ("d", [
            {"kind": "text", "text": "mail a@b.co now", "media_ref": None,
             "offset": 0},
            {"kind": "media", "text": None, "media_ref": "bytes:png",
             "offset": 1},
            {"kind": "pdf_text", "text": "ssn 123-45-6789", "media_ref": None,
             "offset": 2},
        ]),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    p = Process().load(docs).scrub_pii()
    sp = p._require_docs().collect()[0]["spans"]
    assert [s["kind"] for s in sp] == ["text", "media", "pdf_text"]
    assert sp[0]["text"] == "mail [EMAIL] now"
    assert sp[1]["text"] is None and sp[1]["media_ref"] == "bytes:png"
    assert sp[2]["text"] == "ssn [SSN]"
    assert [s["offset"] for s in sp] == [0, 1, 2]


def test_process_filter_language(spark):
    """Process.filter_language keeps only matching languages and
    stashes the verdict."""
    from extractthinker_spark.api import Process

    rows = [
        ("en1", [{"kind": "text",
                  "text": "the cat and the dog of it is to be for on",
                  "media_ref": None, "offset": 0}]),
        ("de1", [{"kind": "text",
                  "text": "der hund und die katze ist das der und die",
                  "media_ref": None, "offset": 0}]),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    p = Process().load(docs).filter_language(keep=["en"])
    kept = {r["doc_id"] for r in p._require_docs().collect()}
    assert kept == {"en1"}
    report = {
        r["doc_id"]: (r["lang"], r["keep"])
        for r in p.language_report.collect()
    }
    assert report["en1"] == ("en", True)
    assert report["de1"] == ("de", False)


def test_host_stats_and_cap(spark):
    """Per-host stats aggregate and the per-domain cap keep the
    smallest doc_ids; Process.cap_per_host filters the corpus and
    stashes the host report."""
    from extractthinker_spark.api import Process
    from extractthinker_spark.functions.urls import cap_per_host, host_stats

    rows = [
        (i,
         f"https://{'Big' if i < 6 else 'small'}.Example.com:443/p{i}",
         "word " * (i + 1),
         i % 2 == 0,   # dup flag
         i != 0)       # keep flag
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, url string, text string, is_dup boolean, "
              "keep boolean",
    )
    stats = {
        r["host"]: r
        for r in host_stats(df, dup_col="is_dup", keep_col="keep").collect()
    }
    big = stats["big.example.com"]
    assert big["n_docs"] == 6 and big["dup_rate"] == 0.5
    assert big["reject_rate"] == round(1 / 6, 4)
    # "word " * (i+1) = i+1 one-token chunks
    assert big["n_tokens"] == sum(range(1, 7))
    assert stats["small.example.com"]["n_docs"] == 2

    capped = cap_per_host(df, 2)
    kept = sorted(r["doc_id"] for r in capped.collect())
    assert kept == [0, 1, 6, 7]  # 2 smallest per host
    assert set(capped.columns) >= {"doc_id", "url", "host"}

    docs = spark.createDataFrame(
        [(i, [{"kind": "text", "text": "t", "media_ref": None,
               "offset": 0}]) for i in range(8)],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    p = Process().load(docs).cap_per_host(
        df.select("doc_id", "url"), max_per_host=2
    )
    assert {r["doc_id"] for r in p._require_docs().collect()} == {0, 1, 6, 7}
    rep = {r["host"]: (r["n_docs"], r["n_kept"])
           for r in p.host_report.collect()}
    assert rep == {"big.example.com": (6, 2), "small.example.com": (2, 2)}


def test_process_filter_c4_and_dedup_exact(spark):
    """Process curation chain: C4 gate drops a lorem-ipsum page and
    dedup_exact keeps the smallest doc_id per identical content."""
    from extractthinker_spark.api import Process

    def doc(i, text):
        return (f"d{i}", [{"kind": "text", "text": text,
                           "media_ref": None, "offset": 0}])

    good = ("This is a proper sentence with enough words here.\n"
            "Another full sentence follows it right away today.\n"
            "And a third one closes the page quite nicely now.")
    docs = spark.createDataFrame(
        [doc(1, good), doc(2, good + "\nlorem ipsum dolor sit amet."),
         doc(3, good)],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    p = Process().load(docs).filter_c4()
    kept = {r["doc_id"] for r in p._require_docs().collect()}
    assert kept == {"d1", "d3"}
    rep = {r["doc_id"]: r["reject_reason"] for r in p.c4_report.collect()}
    assert rep["d2"] == "lorem_ipsum"

    p2 = Process().load(docs).dedup_exact()
    kept2 = {r["doc_id"] for r in p2._require_docs().collect()}
    # d1 and d3 have identical content -> smallest key survives;
    # d2's extra line makes it distinct
    assert kept2 == {"d1", "d2"}


def test_process_decontaminate(spark):
    """Process.decontaminate drops documents colliding with the eval
    set on word n-grams and stashes the hit report."""
    from extractthinker_spark.api import Process

    leak = " ".join(f"w{i}" for i in range(1, 14))
    rows = [
        ("dirty", [("text", f"prefix {leak} suffix", None, 0)]),
        ("clean", [("text", " ".join(f"q{i}" for i in range(1, 20)), None, 0)]),
    ]
    docs = spark.createDataFrame(
        [(d, [{"kind": k, "text": t, "media_ref": m, "offset": o}
              for k, t, m, o in sp]) for d, sp in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    bench = spark.createDataFrame([(f"Q: {leak}?",)], "text string")
    p = Process().load(docs).decontaminate(bench, n=13)
    kept = {r["doc_id"] for r in p.extract_content().select("doc_id").collect()}
    assert kept == {"clean"}
    report = {r["doc_id"]: r["hits"] for r in p.contamination_report.collect()}
    assert report == {"dirty": 1}


def test_process_score_lm(spark):
    """Process.score_lm scores every doc (self-trained model) and the
    threshold filter drops the out-of-distribution document."""
    from extractthinker_spark.api import Process

    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [
        ("a", [("text", common, None, 0)]),
        ("b", [("text", common + " and the cat sat", None, 0)]),
        ("odd", [("text", "zxq qxz zzq qqz xzq zqx", None, 0)]),
    ]
    docs = spark.createDataFrame(
        [(d, [{"kind": k, "text": t, "media_ref": m, "offset": o}
              for k, t, m, o in sp]) for d, sp in rows],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    p = Process().load(docs).score_lm()
    scores = {r["doc_id"]: r["avg_logprob"] for r in p.lm_scores.collect()}
    assert set(scores) == {"a", "b", "odd"}
    assert scores["odd"] < scores["a"]  # rare bigrams score worse
    cut = (scores["odd"] + min(scores["a"], scores["b"])) / 2
    p2 = Process().load(docs).score_lm(min_avg_logprob=cut)
    kept = {r["doc_id"] for r in p2.extract_content().select("doc_id").collect()}
    assert kept == {"a", "b"}
