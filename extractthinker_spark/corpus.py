"""Deterministic synthetic interleaved corpus + golden labels.

Implements FIXTURES.md: a seeded, purely-arithmetic generator for the
input_hint table plus the golden label tables (expected spans,
classification, groups, fields). Determinism comes from integer mixing
of the doc index — NOT from a shared RNG — so generation is identical
under any partitioning and any parallelism (a requirement for the
two-cluster-size scaling evidence).

Archetype mix per FIXTURES.md §1 (bucket = i % 100):
    0-7   invoice_txt            8-15  driver_license_txt
    16-23 vehicle_registration   24-31 ambiguous_credit_note
    32-37 spreadsheet_budget     38-39 mega_text (2% skew docs)
    40-64 html_page (25%)        65-74 bulk_multi (pdf, 10%)
    75-84 gdp_multipage (10%)    85-99 interleaved_media (15%)

Golden outputs are computed from the template parameters directly (not
by running the pipeline), so tests are a real check of the operators.
The expected-output spec per kind (the north-rule invariant surface):
    text      → passthrough
    html      → one text span: main content after boilerplate strip
    pdf_text  → page header "\fPAGE k\n" stripped, body kept per page
    media     → passthrough
    interleaved text → ``![id](id)`` markers replaced by
                ``[Image content: {id}]`` (mirrors the reference's
                Mistral-OCR inline replacement, document_loader_mistral_ocr.py:629-641)
Offsets are re-sequenced 0..n-1 in original order.
"""

from __future__ import annotations

import pandas as pd

from extractthinker_spark.schemas import DOCUMENTS_SCHEMA

SEED = 42

_FIRST = ["ALICE", "BRUNO", "CARLA", "DINES", "EVA", "FARID", "GRETA", "HUGO"]
_LAST = ["SILVA", "NGUYEN", "OKONKWO", "JONES", "MULLER", "ROSSI", "KIM", "DIAZ"]
_DESC = ["Widget", "Gadget", "Service", "License fee", "Subscription", "Part"]
_VEH_TYPE = ["SEDAN", "TRUCK", "SUV", "VAN", "MOTORCYCLE"]
_COLOR = ["RED", "BLUE", "BLACK", "WHITE", "SILVER"]
_COUNTRY = ["Freedonia", "Sylvania", "Osterlich", "Grand Fenwick", "Latveria",
            "Genovia", "Elbonia", "Krakozhia"]
_WORDS = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
          "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()


def _mix(i: int, salt: int) -> int:
    """Deterministic 32-bit integer mix of (doc index, salt)."""
    x = (i * 2654435761 + salt * 40503 + SEED * 69069) & 0xFFFFFFFF
    x ^= x >> 16
    x = (x * 2246822519) & 0xFFFFFFFF
    x ^= x >> 13
    return x


def _pick(seq, i, salt):
    return seq[_mix(i, salt) % len(seq)]


def _sentence(i: int, salt: int, n_words: int) -> str:
    words = [_WORDS[_mix(i, salt * 31 + k) % len(_WORDS)] for k in range(n_words)]
    return " ".join(words)


def archetype_of(i: int) -> str:
    b = i % 100
    if b < 8:
        return "invoice_txt"
    if b < 16:
        return "driver_license_txt"
    if b < 24:
        return "vehicle_registration_txt"
    if b < 32:
        return "ambiguous_credit_note"
    if b < 38:
        return "spreadsheet_budget"
    if b < 40:
        return "mega_text"
    if b < 65:
        return "html_page"
    if b < 75:
        return "bulk_multi"
    if b < 85:
        return "gdp_multipage"
    return "interleaved_media"


def _doc_id(i: int) -> str:
    return f"doc_{i:06d}"


# --------------------------------------------------------------------------
# Per-archetype content builders.  Each returns:
#   spans          : list[(kind, text, media_ref)]  (input)
#   expected_spans : list[(kind, text, media_ref)]  (golden output)
#   classification : (name, confidence)             (golden argmax)
#   groups         : list[(group_id, pages, class)] (pdf docs only)
#   fields         : list[(contract, field, value)] (golden extraction)
# --------------------------------------------------------------------------

def _invoice(i):
    num = f"{_mix(i, 1) % 100000:05d}"
    m, d, yy = _mix(i, 2) % 12 + 1, _mix(i, 3) % 28 + 1, _mix(i, 4) % 30 + 70
    date = f"{m}/{d}/{yy}"
    qty = _mix(i, 5) % 9 + 1
    unit = (_mix(i, 6) % 50000) / 100.0
    amount = round(qty * unit, 2)
    desc = _pick(_DESC, i, 7)
    text = (
        f"Invoice #{num}\nDate: {date}\n"
        f"{desc} {qty} x {unit:.2f} = {amount:.2f}\nTotal: {amount:.2f}"
    )
    spans = [("text", text, None)]
    fields = [
        ("Invoice", "invoice_number", num),
        ("Invoice", "invoice_date", date),
        ("Invoice", "total_amount", f"{amount:.2f}"),
    ]
    return spans, list(spans), ("Invoice", 10), [], fields


def _driver_license(i):
    name = f"{_pick(_LAST, i, 1)}, {_pick(_FIRST, i, 2)} {chr(65 + _mix(i, 3) % 26)}"
    age = _mix(i, 4) % 60 + 18
    lic = f"{_mix(i, 5) % 10**10:010d}"
    text = f"DRIVER LICENSE\nName: {name}\nAge: {age}\nLicense No: {lic}"
    spans = [("text", text, None)]
    fields = [
        ("Driver License", "name", name),
        ("Driver License", "age", str(age)),
        ("Driver License", "license_number", lic),
    ]
    return spans, list(spans), ("Driver License", 10), [], fields


def _vr_page1(i):
    name = f"{_pick(_FIRST, i, 11)} {_pick(_LAST, i, 12)}"
    return (
        f"VEHICLE REGISTRATION\nName Primary: {name}\n"
        f"Vehicle Type: {_pick(_VEH_TYPE, i, 13)}",
        name,
    )


def _vr_page2(i):
    plate = (
        f"{chr(65 + _mix(i, 14) % 26)}{chr(65 + _mix(i, 15) % 26)}"
        f"{chr(65 + _mix(i, 16) % 26)}-{_mix(i, 17) % 10000:04d}"
    )
    return f"Vehicle Color: {_pick(_COLOR, i, 18)}\nPlate: {plate}", plate


def _vehicle_registration(i):
    p1, name = _vr_page1(i)
    p2, plate = _vr_page2(i)
    text = p1 + "\n" + p2
    spans = [("text", text, None)]
    fields = [
        ("Vehicle Registration", "name_primary", name),
        ("Vehicle Registration", "vehicle_type", _pick(_VEH_TYPE, i, 13)),
        ("Vehicle Registration", "vehicle_color", _pick(_COLOR, i, 18)),
        ("Vehicle Registration", "plate", plate),
    ]
    return spans, list(spans), ("Vehicle Registration", 10), [], fields


def _credit_note(i):
    # Deliberately ambiguous: shares "invoice"/"total" vocabulary with
    # Invoice, and omits "Credit Amount" so Credit Note scores only 3
    # hits (confidence 8) — exercises threshold fallback.
    num = f"{_mix(i, 1) % 100000:05d}"
    amt = (_mix(i, 2) % 90000) / 100.0
    text = f"CREDIT NOTE\nReference Invoice #{num}\nTotal: {amt:.2f}"
    spans = [("text", text, None)]
    return spans, list(spans), ("Credit Note", 8), [], []


def _spreadsheet(i):
    income = 5000 + _mix(i, 1) % 2000
    expense = 3000 + _mix(i, 2) % 1000
    rows = [
        "Category | Amount",
        f"Income | {income}",
        f"Expense | {expense}",
        f"Cash Flow | {income - expense}",
    ]
    text = "\n".join(rows)
    spans = [("text", text, None)]
    fields = [
        ("Budget", "income", str(income)),
        ("Budget", "expense", str(expense)),
        ("Budget", "cash_flow", str(income - expense)),
    ]
    return spans, list(spans), ("Budget", 10), [], fields


def _mega(i):
    # Skew doc: 1000+ text spans (sub-batching / salting tests).
    n = 1000 + _mix(i, 1) % 200
    spans = [("text", _sentence(i, 100 + k, 8), None) for k in range(n)]
    return spans, list(spans), ("Unknown", 1), [], []


def _html(i):
    heading = _sentence(i, 1, 3).title()
    para1 = _sentence(i, 2, 20).capitalize() + "."
    para2 = _sentence(i, 3, 24).capitalize() + "."
    links = " ".join(
        f'<a href="/p{k}">{_sentence(i, 40 + k, 2)}</a>' for k in range(8)
    )
    html = (
        "<html><head><title>t</title><style>.x{color:red}</style>"
        "<script>var x=1;</script></head><body>"
        "<nav>Home | About | Contact</nav>"
        f"<article><h1>{heading}</h1><p>{para1}</p><p>{para2}</p></article>"
        f'<div class="links">{links}</div>'
        "<footer>© 2024 example.com</footer></body></html>"
    )
    main = f"{heading} {para1} {para2}"
    spans = [("html", html, None)]
    return spans, [("text", main, None)], ("Unknown", 1), [], []


def _bulk(i):
    p1, name = _vr_page1(i)
    p2, plate = _vr_page2(i)
    dl_spans, _, _, _, dl_fields = _driver_license(i)
    dl_text = dl_spans[0][1]
    spans = [
        ("pdf_text", f"\fPAGE 1\n{p1}", None),
        ("pdf_text", f"\fPAGE 2\n{p2}", None),
        ("pdf_text", f"\fPAGE 3\n{dl_text}", None),
    ]
    expected = [
        ("pdf_text", p1, None),
        ("pdf_text", p2, None),
        ("pdf_text", dl_text, None),
    ]
    groups = [
        (1, [1, 2], "Vehicle Registration"),
        (2, [3], "Driver License"),
    ]
    fields = [
        ("Vehicle Registration", "name_primary", name),
        ("Vehicle Registration", "vehicle_type", _pick(_VEH_TYPE, i, 13)),
        ("Vehicle Registration", "vehicle_color", _pick(_COLOR, i, 18)),
        ("Vehicle Registration", "plate", plate),
    ] + dl_fields
    # Doc-level class of a multi-document bundle: both VR and DL score a
    # full 4 hits (confidence 10); the spec's tie-break is alphabetical,
    # so "Driver License" wins. Group-level classes (the meaningful
    # ones) are in ``groups``.
    return spans, expected, ("Driver License", 10), groups, fields


def _gdp(i):
    pages, expected, fields = [], [], []
    for p in (1, 2):
        rows = []
        for k in range(3):
            ci = (p - 1) * 3 + k
            country = _COUNTRY[(_mix(i, 1) + ci) % len(_COUNTRY)]
            gdp = 10000 + _mix(i, 50 + ci) % 50000
            rows.append(f"Country: {country} Province: P{ci} GDP per capita: {gdp}")
            fields.append(("GDP Report", f"country_{ci}", country))
        body = "GDP REPORT\n" + "\n".join(rows)
        pages.append(("pdf_text", f"\fPAGE {p}\n{body}", None))
        expected.append(("pdf_text", body, None))
    groups = [(1, [1, 2], "GDP Report")]
    return pages, expected, ("GDP Report", 10), groups, fields


def _interleaved(i):
    doc = _doc_id(i)
    n_img = _mix(i, 1) % 3 + 1
    spans, expected = [], []
    for k in range(n_img):
        t = _sentence(i, 60 + k, 12).capitalize() + f". ![img-{k}](img-{k})"
        spans.append(("text", t, None))
        spans.append(("media", None, f"img://{doc}/{k}"))
        t_exp = t.replace(f"![img-{k}](img-{k})", f"[Image content: img-{k}]")
        expected.append(("text", t_exp, None))
        expected.append(("media", None, f"img://{doc}/{k}"))
    tail = _sentence(i, 90, 10).capitalize() + "."
    spans.append(("text", tail, None))
    expected.append(("text", tail, None))
    return spans, expected, ("Unknown", 1), [], []


_BUILDERS = {
    "invoice_txt": _invoice,
    "driver_license_txt": _driver_license,
    "vehicle_registration_txt": _vehicle_registration,
    "ambiguous_credit_note": _credit_note,
    "spreadsheet_budget": _spreadsheet,
    "mega_text": _mega,
    "html_page": _html,
    "bulk_multi": _bulk,
    "gdp_multipage": _gdp,
    "interleaved_media": _interleaved,
}


def gen_doc(i: int) -> dict:
    """Generate one document + its goldens. Pure function of ``i``."""
    arch = archetype_of(i)
    spans, expected, cls, groups, fields = _BUILDERS[arch](i)
    doc = _doc_id(i)
    return {
        "doc_id": doc,
        "archetype": arch,
        "spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": off}
            for off, (k, t, m) in enumerate(spans)
        ],
        "expected_spans": [
            {"kind": k, "text": t, "media_ref": m, "offset": off}
            for off, (k, t, m) in enumerate(expected)
        ],
        "expected_class": cls,
        "expected_groups": groups,
        "expected_fields": fields,
    }


def corpus_pandas(n_docs: int, start: int = 0) -> pd.DataFrame:
    """Small-scale local generation (tests)."""
    return pd.DataFrame([gen_doc(i) for i in range(start, start + n_docs)])


def corpus_spark(spark, n_docs: int, partitions: int | None = None):
    """Distributed generation: spark.range → mapInPandas.

    Scales to any n_docs — each partition generates its own index range
    with no driver-side data; deterministic regardless of partitioning.
    """
    partitions = partitions or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_docs, 1, partitions)

    def gen(batches):
        for pdf in batches:
            rows = [gen_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "spans": [r["spans"] for r in rows],
                }
            )

    return rng.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)


def goldens_pandas(n_docs: int, start: int = 0) -> dict[str, pd.DataFrame]:
    """Golden label tables for tests (FIXTURES.md §4)."""
    rows = [gen_doc(i) for i in range(start, start + n_docs)]
    expected_spans = pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in rows],
         "spans": [r["expected_spans"] for r in rows]}
    )
    expected_class = pd.DataFrame(
        {"doc_id": [r["doc_id"] for r in rows],
         "name": [r["expected_class"][0] for r in rows],
         "confidence": [r["expected_class"][1] for r in rows]}
    )
    grp = [
        (r["doc_id"], g, pages, cls)
        for r in rows for (g, pages, cls) in r["expected_groups"]
    ]
    expected_groups = pd.DataFrame(
        grp, columns=["doc_id", "group_id", "pages", "classification"]
    )
    fld = [
        (r["doc_id"], c, f, v)
        for r in rows for (c, f, v) in r["expected_fields"]
    ]
    expected_fields = pd.DataFrame(
        fld, columns=["doc_id", "contract", "field", "value"]
    )
    return {
        "expected_spans": expected_spans,
        "expected_classification": expected_class,
        "expected_groups": expected_groups,
        "expected_fields": expected_fields,
    }
