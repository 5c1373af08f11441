"""Eval module: field comparison, P/R/F1 metrics, hallucination.

Golden values hand-computed from the reference semantics
(eval/field_comparison.py, eval/metrics.py, eval/hallucination.py) —
mirrors tests/test_evaluator.py's golden-metric style.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.eval import (
    doc_hallucination,
    document_accuracy,
    exact_match,
    field_metrics,
    fuzzy_match,
    fuzzy_ratio,
    hallucination_score,
    numeric_match,
    schema_validity,
)


def _cmp(spark, fn, pairs):
    df = spark.createDataFrame(pairs, "expected string, predicted string")
    return [
        r["m"]
        for r in df.select(
            fn(F.col("expected"), F.col("predicted")).alias("m")
        ).collect()
    ]


def test_exact_match(spark):
    got = _cmp(
        spark,
        exact_match,
        [("a", "a"), (" a ", "a"), ("a", "b"), (None, None), ("a", None)],
    )
    assert got == [True, True, False, True, False]


def test_fuzzy_ratio_and_match(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("abc", "abc"), ("", "")],
        "expected string, predicted string",
    )
    rows = df.select(
        fuzzy_ratio(F.col("expected"), F.col("predicted")).alias("r"),
        fuzzy_match(F.col("expected"), F.col("predicted"), 0.8).alias("m"),
    ).collect()
    # levenshtein(kitten, sitting)=3, max_len=7 -> 1-3/7
    assert abs(rows[0]["r"] - (1 - 3 / 7)) < 1e-6 and rows[0]["m"] is False
    assert rows[1]["r"] == 1.0 and rows[1]["m"] is True
    assert rows[2]["r"] == 1.0 and rows[2]["m"] is True


def test_numeric_match(spark):
    got = _cmp(
        spark,
        numeric_match,
        [
            ("100", "100.5"),   # 0.5% <= 1% tol
            ("100", "102"),     # 2% > tol
            ("0", "0.005"),     # absolute at zero
            ("0", "0.05"),
            ("abc", "abc"),     # non-numeric -> exact fallback
            ("abc", "abd"),
        ],
    )
    assert got == [True, False, True, False, True, False]


def test_field_metrics_golden(spark):
    # field f1: 2 correct, 1 wrong-present, 1 wrong-absent
    #   -> TP=2 FP=1 FN=1, P=2/3, R=2/3, F1=2/3, acc=0.5
    rows = [
        ("d1", "f1", "a", "a"),
        ("d2", "f1", "b", "b"),
        ("d3", "f1", "c", "x"),
        ("d4", "f1", "d", ""),
        ("d1", "f2", "1", "1"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, field string, expected string, predicted string"
    )
    m = {r["field"]: r for r in field_metrics(df).collect()}
    f1 = m["f1"]
    assert (f1["tp"], f1["fp"], f1["fn"], f1["total"]) == (2, 1, 1, 4)
    assert abs(f1["precision"] - 2 / 3) < 1e-6
    assert abs(f1["recall"] - 2 / 3) < 1e-6
    assert abs(f1["f1"] - 2 / 3) < 1e-6
    assert f1["accuracy"] == 0.5
    assert m["f2"]["precision"] == 1.0

    acc = document_accuracy(df).collect()[0]
    # d1 all-correct, d2 correct, d3/d4 wrong -> 2/4
    assert acc["n_docs"] == 4 and acc["n_correct_docs"] == 2
    assert acc["doc_accuracy"] == 0.5

    sv = schema_validity(
        df, F.col("predicted") != ""
    ).collect()[0]
    assert sv["n_valid"] == 4 and sv["n_invalid"] == 1
    assert sv["success_rate"] == 0.8


def test_hallucination_tiers(spark):
    doc = "Invoice Number 00012 issued to ACME Corp on January 30."
    rows = [
        ("d", "00012", doc),            # verbatim -> 0.0
        ("d", "ACME January", doc),     # all words, not phrase -> 0.3
        ("d", "Corpxyz", doc),          # 4-gram 'Corp' -> 0.6
        ("d", "zzqqy", doc),            # nothing -> 0.9
        ("d", None, doc),               # skipped
    ]
    df = spark.createDataFrame(rows, "doc_id string, value string, doc_text string")
    got = [
        r["s"]
        for r in df.select(
            hallucination_score(F.col("value"), F.col("doc_text")).alias("s")
        ).collect()
    ]
    assert got == [0.0, 0.3, 0.6, 0.9, None]

    agg = doc_hallucination(df).collect()[0]
    # 4 scored fields, 1 >= 0.7 -> overall 0.25
    assert agg["n_fields"] == 4 and agg["n_contradicted"] == 1
    assert agg["overall_score"] == 0.25


def test_teacher_student_comparative(spark):
    """TeacherStudentEvaluator semantics (evaluator.py:427-780): per-
    field F1 for both sides + improvement %, document accuracy for
    both sides, reference report shape."""
    from extractthinker_spark.eval.comparative import (
        build_comparative_report,
        comparative_document_accuracy,
        comparative_field_metrics,
        comparative_report_to_markdown,
        join_predictions,
    )

    labels = spark.createDataFrame(
        [("d1", "amount", "10"), ("d2", "amount", "20"),
         ("d3", "amount", "30"), ("d4", "amount", "40"),
         ("d1", "vendor", "acme"), ("d2", "vendor", "bolt"),
         ("d3", "vendor", "corp"), ("d4", "vendor", "dune")],
        "doc_id string, field string, expected string",
    )
    # student: amount right on 2/4 (one wrong-present, one missing),
    # vendor right on 4/4; teacher: everything right except d4.amount
    # wrong-present
    student = spark.createDataFrame(
        [("d1", "amount", "10"), ("d2", "amount", "20"),
         ("d3", "amount", "99"),
         ("d1", "vendor", "acme"), ("d2", "vendor", "bolt"),
         ("d3", "vendor", "corp"), ("d4", "vendor", "dune")],
        "doc_id string, field string, predicted string",
    )
    teacher = spark.createDataFrame(
        [("d1", "amount", "10"), ("d2", "amount", "20"),
         ("d3", "amount", "30"), ("d4", "amount", "41"),
         ("d1", "vendor", "acme"), ("d2", "vendor", "bolt"),
         ("d3", "vendor", "corp"), ("d4", "vendor", "dune")],
        "doc_id string, field string, predicted string",
    )
    joined = join_predictions(labels, student, teacher)
    fm = {r["field"]: r for r in comparative_field_metrics(joined).collect()}

    am = fm["amount"]
    # student amount: TP=2 FP=1 FN=1 -> P=R=F1=2/3
    assert (am["s_tp"], am["s_fp"], am["s_fn"]) == (2, 1, 1)
    assert abs(am["s_f1"] - 0.666667) < 1e-6
    # teacher amount: TP=3 FP=1 FN=0 -> P=3/4 R=1 F1=6/7
    assert (am["t_tp"], am["t_fp"], am["t_fn"]) == (3, 1, 0)
    assert abs(am["t_f1"] - 6 / 7) < 1e-5
    assert abs(am["improvement_pct"] - (am["t_f1"] - am["s_f1"])
               / am["s_f1"] * 100) < 1e-4
    # vendor: both perfect -> improvement 0
    assert fm["vendor"]["improvement_pct"] == 0.0
    assert fm["vendor"]["s_f1"] == 1.0 and fm["vendor"]["t_f1"] == 1.0

    acc = comparative_document_accuracy(joined).collect()[0]
    # docs fully correct: student {d1,d2}=0.5, teacher {d1,d2,d3}=0.75
    assert acc["n_docs"] == 4
    assert acc["student_doc_accuracy"] == 0.5
    assert acc["teacher_doc_accuracy"] == 0.75
    assert abs(acc["doc_accuracy_improvement"] - 50.0) < 1e-6

    report = build_comparative_report(
        "ts", comparative_field_metrics(joined),
        comparative_document_accuracy(joined),
        student_model="rules-v1", teacher_model="rules-v2",
    )
    assert report["metrics"]["documents_evaluated"] == 4
    assert set(report["field_improvements"]) == {"amount", "vendor"}
    assert report["field_metrics"]["amount"]["tp"] == 2
    assert report["teacher_field_metrics"]["amount"]["tp"] == 3
    md = comparative_report_to_markdown(report)
    assert "| amount |" in md and "rules-v2" in md


def test_teacher_student_zero_student_f1(spark):
    """Improvement is +inf when the student scores 0 and the teacher
    doesn't, 0 when both score 0 (evaluator.py:739-744)."""
    from extractthinker_spark.eval.comparative import (
        comparative_field_metrics,
        join_predictions,
    )

    labels = spark.createDataFrame(
        [("d1", "a", "x"), ("d1", "b", "y")],
        "doc_id string, field string, expected string",
    )
    student = spark.createDataFrame(
        [("d1", "a", "wrong"), ("d1", "b", "wrong")],
        "doc_id string, field string, predicted string",
    )
    teacher = spark.createDataFrame(
        [("d1", "a", "x"), ("d1", "b", "also-wrong")],
        "doc_id string, field string, predicted string",
    )
    fm = {
        r["field"]: r
        for r in comparative_field_metrics(
            join_predictions(labels, student, teacher)
        ).collect()
    }
    assert fm["a"]["s_f1"] == 0.0 and fm["a"]["t_f1"] == 1.0
    assert fm["a"]["improvement_pct"] == float("inf")
    assert fm["b"]["s_f1"] == 0.0 and fm["b"]["t_f1"] == 0.0
    assert fm["b"]["improvement_pct"] == 0.0


def _write_eval_fixture(tmp_path):
    import json as _json

    from extractthinker_spark.operators.rawbytes import make_fixture_pdf

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    (docs_dir / "inv1.pdf").write_bytes(
        make_fixture_pdf(["Invoice #42\nDate: 1/2/03\nTotal: 99.50"])
    )
    (docs_dir / "inv2.pdf").write_bytes(
        make_fixture_pdf(["Invoice #7\nDate: 4/5/06\nTotal: 10.00"],
                         compress=True)
    )
    labels = {
        "inv1.pdf": {"invoice_number": "42", "invoice_date": "1/2/03",
                     "total_amount": "99.50"},
        "inv2.pdf": {"invoice_number": "7", "invoice_date": "4/5/06",
                     "total_amount": "11.00"},   # planted mismatch
    }
    labels_path = tmp_path / "labels.json"
    labels_path.write_text(_json.dumps(labels))
    config = {
        "documents_dir": str(docs_dir),
        "labels_path": str(labels_path),
        "contract": "Invoice",
        "evaluation_name": "cli-smoke",
    }
    config_path = tmp_path / "config.json"
    config_path.write_text(_json.dumps(config))
    return config, config_path


def test_eval_run_pipeline(spark, tmp_path):
    """run_eval drives the full library surface: binaryFile scan →
    raw decode (one compressed PDF) → strip → contract extraction →
    metrics → report dict."""
    from extractthinker_spark.eval.cli import run_eval

    config, _ = _write_eval_fixture(tmp_path)
    report = run_eval(spark, config)
    fm = report["field_metrics"]
    # invoice_number/date right on both docs; total right on one
    assert fm["invoice_number"]["tp"] == 2
    assert fm["invoice_date"]["tp"] == 2
    assert fm["total_amount"]["tp"] == 1 and fm["total_amount"]["fp"] == 1
    assert report["documents"]["n_docs"] == 2
    assert report["documents"]["n_correct_docs"] == 1
    # hallucination path wires predicted values against doc text
    report_h = run_eval(spark, {**config, "detect_hallucinations": True})
    assert report_h["hallucination"]["n_fields"] > 0


def test_eval_cli_module_main(tmp_path):
    """`python -m extractthinker_spark.eval` end to end (reference
    eval/cli.py entry): runs the config, prints the summary, saves the
    JSON report (save_report) and the markdown twin."""
    import json as _json
    import subprocess
    import sys

    _, config_path = _write_eval_fixture(tmp_path)
    out_json = tmp_path / "report.json"
    out_md = tmp_path / "report.md"
    proc = subprocess.run(
        [sys.executable, "-m", "extractthinker_spark.eval",
         "--config", str(config_path), "--output", str(out_json),
         "--markdown", str(out_md), "--master", "local[2]"],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert f"Report saved to: {out_json}" in proc.stdout
    report = _json.loads(out_json.read_text())
    assert report["evaluation_name"] == "cli-smoke"
    assert report["field_metrics"]["invoice_number"]["tp"] == 2
    assert "# Evaluation: cli-smoke" in out_md.read_text()


def test_report_assembly(spark):
    from extractthinker_spark.eval.report import build_report, report_to_markdown

    rows = [
        ("d1", "f1", "a", "a"),
        ("d2", "f1", "b", "x"),
        ("d1", "f2", "1", "1"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, field string, expected string, predicted string"
    )
    h = spark.createDataFrame(
        [("d1", "a", "text with a")], "doc_id string, value string, doc_text string"
    )
    rep = build_report(
        "smoke",
        field_metrics(df),
        document_accuracy(df),
        doc_hallucination(h),
    )
    assert rep["field_metrics"]["f1"]["tp"] == 1
    assert rep["field_metrics"]["f2"]["precision"] == 1.0
    assert rep["documents"]["n_docs"] == 2
    assert rep["hallucination"]["n_fields"] == 1
    md = report_to_markdown(rep)
    assert "# Evaluation: smoke" in md and "| f1 |" in md


def test_exact_match_complex(spark):
    """Sorted-key canonical compare for complex values; plain strings
    fall back to trimmed exact (field_comparison.py:50-64)."""
    import pyspark.sql.functions as F

    from extractthinker_spark.eval.field_compare import exact_match_complex

    rows = [
        (1, '{"b": 2, "a": 1}', '{"a": 1, "b": 2}', True),     # reorder
        (2, '{"a": {"y": 2, "x": 1}}', '{"a": {"x": 1, "y": 2}}', True),
        (3, '[1, 2]', '[1,2]', True),                           # whitespace
        (4, '{"a": 1}', '{"a": 2}', False),
        (5, '[1, 2]', '[2, 1]', False),                         # order matters
        (6, " plain ", "plain", True),                          # str fallback
        (7, "12", " 12 ", True),                                # scalar JSON -> str
        (8, None, None, True),
        (9, '{"a": 1}', None, False),
    ]
    df = spark.createDataFrame(
        [(i, e, p) for i, e, p, _ in rows], "i int, e string, p string"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", exact_match_complex(F.col("e"), F.col("p")).alias("m")
        ).collect()
    }
    for i, _, _, want in rows:
        assert got[i] == want, i


def test_filesystem_dataset_and_labels(spark, tmp_path):
    """FileSystemDataset semantics (eval/dataset.py:48-120): binaryFile
    scan + JSON labels, validation both ways, spans via the raw-bytes
    decoder, and an eval join producing per-field matches."""
    import json

    import pyspark.sql.functions as F
    import pytest

    from extractthinker_spark.eval.dataset import (
        filesystem_dataset,
        labels_from_json,
    )
    from extractthinker_spark.eval.field_compare import exact_match
    from extractthinker_spark.operators.rawbytes import (
        make_fixture_pdf,
        parse_raw_bytes,
    )

    docs_dir = tmp_path / "docs"
    docs_dir.mkdir()
    (docs_dir / "inv1.pdf").write_bytes(
        make_fixture_pdf(["Invoice #42\nTotal: 99.50"])
    )
    (docs_dir / "note1.txt").write_bytes(b"just a note")
    labels = {
        "inv1.pdf": {"invoice_number": "42", "items": [{"q": 1, "p": 2}]},
        "note1.txt": {"kind": "note"},
    }
    labels_path = tmp_path / "labels.json"
    labels_path.write_text(json.dumps(labels))

    docs, lab = filesystem_dataset(spark, str(docs_dir), str(labels_path))
    assert {r["doc_id"] for r in docs.collect()} == {"inv1.pdf", "note1.txt"}
    got_lab = {
        (r["doc_id"], r["field"]): r["expected"] for r in lab.collect()
    }
    assert got_lab[("inv1.pdf", "invoice_number")] == "42"
    assert got_lab[("inv1.pdf", "items")] == '[{"p": 2, "q": 1}]'  # sorted keys

    # road into spans + an eval join
    spans = parse_raw_bytes(docs)
    inv = spans.filter(F.col("format") == "pdf").select(
        "doc_id",
        F.regexp_extract(
            F.col("spans")[0]["text"], r"Invoice #(\d+)", 1
        ).alias("predicted"),
    )
    joined = inv.join(
        lab.filter(F.col("field") == "invoice_number"), "doc_id"
    ).select(exact_match(F.col("expected"), F.col("predicted")).alias("m"))
    assert [r["m"] for r in joined.collect()] == [True]

    # validation: a document without a label
    (docs_dir / "orphan.txt").write_bytes(b"x")
    with pytest.raises(ValueError, match="orphan.txt"):
        filesystem_dataset(spark, str(docs_dir), str(labels_path))
    (docs_dir / "orphan.txt").unlink()
    labels["ghost.pdf"] = {"a": 1}
    labels_path.write_text(json.dumps(labels))
    with pytest.raises(ValueError, match="ghost.pdf"):
        filesystem_dataset(spark, str(docs_dir), str(labels_path))

    # labels_from_json alone: bool/None stringification
    labels_path.write_text(json.dumps({"d": {"b": True, "n": None}}))
    got = {
        (r["doc_id"], r["field"]): r["expected"]
        for r in labels_from_json(spark, str(labels_path)).collect()
    }
    assert got[("d", "b")] == "true" and got[("d", "n")] is None


def test_url_predicate_and_base64(spark):
    import pyspark.sql.functions as F

    from extractthinker_spark.operators.media import to_base64
    from extractthinker_spark.operators.parse_core import is_url

    df = spark.createDataFrame(
        [
            (1, "https://example.com/a/b", True),
            (2, "http://host", True),
            (3, "HTTPS://HOST/x", True),
            (4, "ftp://host", False),
            (5, "not a url", False),
            (6, "https:///nopath", False),
        ],
        "i int, s string, want boolean",
    )
    bad = df.filter(is_url(F.col("s")) != F.col("want")).count()
    assert bad == 0

    b = spark.createDataFrame([(b"\x00\x01img",)], "raw binary")
    assert b.select(to_base64(F.col("raw")).alias("x")).collect()[0]["x"] == "AAFpbWc="
