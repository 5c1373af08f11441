"""Legacy text encodings: UTF-16 BOM sniff + transcode re-dispatch,
cp1252 single-byte fallback (WHATWG windows-1252 table), and HTML
<meta charset> consultation — the charset surface the reference gets
from bs4/UnicodeDammit (document_loader_beautiful_soup.py:175-206)."""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.operators.rawbytes import (
    decode_cp1252,
    decode_html_bytes,
    decode_text_bytes,
    detect_format_bytes,
    parse_raw_bytes,
    sniff_bytes,
)


def test_utf16_bom_sniff_python_and_catalyst(spark):
    cases = [
        (b"\xff\xfe" + "héllo".encode("utf-16-le"), "utf16"),
        (b"\xfe\xff" + "héllo".encode("utf-16-be"), "utf16"),
        (b"\xff\xfe", "utf16"),                      # bare BOM
        (b"\xff\xfe\x00\x00rest", "unknown"),        # UTF-32LE BOM
        (b"\xfe\xff\x00\x00", "utf16"),              # BE: U+0000 char ok
    ]
    for b, want in cases:
        assert sniff_bytes(b) == want, (b[:8], want)
    df = spark.createDataFrame(
        [(i, b) for i, (b, _) in enumerate(cases)], "i int, raw binary"
    )
    got = {
        r["i"]: r["f"]
        for r in df.select(
            "i", detect_format_bytes(F.col("raw")).alias("f")
        ).collect()
    }
    for i, (b, want) in enumerate(cases):
        assert got[i] == want, (i, b[:8], got[i], want)


def test_decode_cp1252_whatwg_table():
    # 0x80-0x9F are the bytes latin-1 gets wrong (C1 controls)
    assert decode_cp1252(b"caf\xe9 \x93ok\x94 \x97 \x85 \x80") == (
        "café “ok” — … €"
    )
    # the five undefined bytes pass through as C1 (never U+FFFD)
    assert decode_cp1252(b"\x81\x8d\x8f\x90\x9d") == (
        "\x81\x8d\x8f\x90\x9d"
    )


def test_decode_text_bytes_ladder():
    # BOMs win
    assert decode_text_bytes(b"\xef\xbb\xbfhi") == "hi"
    assert decode_text_bytes(b"\xff\xfe" + "héllo".encode("utf-16-le")) == "héllo"
    assert decode_text_bytes(b"\xfe\xff" + "héllo".encode("utf-16-be")) == "héllo"
    # strict UTF-8 second
    assert decode_text_bytes("naïve".encode("utf-8")) == "naïve"
    # cp1252 last: curly quotes survive instead of becoming C1 junk
    assert decode_text_bytes(b"he said \x93hi\x94") == "he said “hi”"


def test_decode_html_bytes_meta_charset():
    doc = b'<html><head><meta charset="windows-1252"></head>\x97</html>'
    assert "—" in decode_html_bytes(doc)
    # http-equiv form + iso-8859-1 label upgrades to cp1252 (WHATWG)
    doc2 = (b'<html><meta http-equiv="Content-Type" '
            b'content="text/html; charset=iso-8859-1">\x93q\x94</html>')
    assert "“q”" in decode_html_bytes(doc2)
    # a declared non-latin codec is honored (stdlib lookup)
    doc3 = (b'<html><meta charset="shift_jis">'
            + "日本".encode("shift_jis") + b"</html>")
    assert "日本" in decode_html_bytes(doc3)
    # unknown label falls through to the UTF-8 -> cp1252 ladder
    doc4 = b'<html><meta charset="no-such-cs">ok \x97</html>'
    assert "—" in decode_html_bytes(doc4)
    # BOM beats a lying meta declaration
    doc5 = b"\xef\xbb\xbf" + "<html><meta charset=\"shift_jis\">é".encode("utf-8")
    assert decode_html_bytes(doc5).endswith("é")


def test_utf16_payload_redispatch(spark):
    """UTF-16 files are routinely html/json, not just txt — the utf16
    verdict transcodes and re-dispatches, reporting a 'utf16+<inner>'
    chain like the compressed-container convention."""
    rows = [
        ("le_txt", b"\xff\xfe" + "p: héllo\n\nwörld".encode("utf-16-le"),
         None),
        ("be_html", b"\xfe\xff" + "<html><body>ünïcode".encode("utf-16-be"),
         None),
        ("le_json", b"\xff\xfe" + '{"k": 1}'.encode("utf-16-le"), None),
        ("le_csv", b"\xff\xfe" + "a,b\n1,2".encode("utf-16-le"),
         "data/t.csv"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, raw binary, uri string")
    out = {r["doc_id"]: r for r in parse_raw_bytes(df, uri_col="uri").collect()}
    assert out["le_txt"]["format"] == "utf16+txt"
    assert [s["text"] for s in out["le_txt"]["spans"]] == ["p: héllo", "wörld"]
    assert out["be_html"]["format"] == "utf16+html"
    assert out["be_html"]["spans"][0]["kind"] == "html"
    assert out["be_html"]["spans"][0]["text"] == "<html><body>ünïcode"
    assert out["le_json"]["format"] == "utf16+json"
    assert out["le_csv"]["format"] == "utf16+csv"
    assert out["le_csv"]["spans"][0]["text"] == "a | b\n1 | 2"


def test_cp1252_and_meta_charset_spans(spark):
    """cp1252 plain text rides the extension hint (its head is not
    valid UTF-8, so content sniff cannot claim it); html with high
    bytes past the sniff window decodes through its meta charset."""
    pad = b"x" * 300
    rows = [
        ("win", b"p: \x93quoted\x94 \x97 dash", "note.txt"),
        ("winhtml",
         b'<html><head><meta charset="windows-1252"></head><body>'
         + pad + b"\x85done</html>", "page.html"),
        ("exthtml", b"<div>\x97no doctype</div>", "frag.html"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, raw binary, uri string")
    out = {r["doc_id"]: r for r in parse_raw_bytes(df, uri_col="uri").collect()}
    assert out["win"]["format"] == "txt"
    assert out["win"]["spans"][0]["text"] == "p: “quoted” — dash"
    assert out["winhtml"]["format"] == "html"
    assert "…done" in out["winhtml"]["spans"][0]["text"]
    # no doctype + invalid head -> unknown sniff, .html ext routes it
    assert out["exthtml"]["format"] == "html"
    assert "—no doctype" in out["exthtml"]["spans"][0]["text"]


def test_pdf_simple_decode_winansi_default():
    """Fonts with no /Encoding dict decode WinAnsi (cp1252), not
    latin-1: 0x93/0x94/0x97 are curly quotes and em-dash."""
    from extractthinker_spark.operators.rawbytes import _pdf_simple_decode

    assert _pdf_simple_decode(b"a \x93b\x94 \x97 c", None) == (
        "a “b” — c"
    )
    # an explicit encoding map still wins per code point
    enc = {0x93: "X"}
    assert _pdf_simple_decode(b"\x93\x94", enc) == "X”"


def test_rtf_hex_escape_cp1252():
    from extractthinker_spark.operators.rawbytes import decode_rtf_pages

    rtf = rb"{\rtf1\ansi\ansicpg1252 quote \'93hi\'94 dash \'97}"
    pages = decode_rtf_pages(rtf)
    assert pages == ["quote “hi” dash —"]


def test_xml_encoding_declaration(spark):
    """The XML prolog's encoding= declaration governs the decode
    (XML 1.0 §4.3.3), same label ladder as the HTML meta prescan."""
    from extractthinker_spark.operators.rawbytes import decode_xml_bytes

    doc = (b'<?xml version="1.0" encoding="iso-8859-1"?>'
           b"<r>caf\xe9 \x97 dash</r>")
    assert decode_xml_bytes(doc) == (
        '<?xml version="1.0" encoding="iso-8859-1"?><r>café — dash</r>'
    )
    sj = "日本".encode("shift_jis")
    doc2 = b'<?xml version="1.0" encoding="shift_jis"?><r>' + sj + b"</r>"
    assert "日本" in decode_xml_bytes(doc2)
    # no declaration: strict-utf8 first, cp1252 fallback
    assert decode_xml_bytes(b"<r>ok \x93q\x94</r>") == "<r>ok “q”</r>"
    # the spans road: a sniffable UTF-8-headed xml with declared
    # latin-1 bytes beyond the head decodes through the declaration
    pad = b"<pad>" + b"x" * 260 + b"</pad>"
    rows = [("x1",
             b'<?xml version="1.0" encoding="iso-8859-1"?><r>'
             + pad + b"caf\xe9 \x97</r>", None)]
    df = spark.createDataFrame(rows, "doc_id string, raw binary, uri string")
    out = parse_raw_bytes(df, uri_col="uri").collect()[0]
    assert out["format"] == "xml"
    assert "café —" in out["spans"][0]["text"]
