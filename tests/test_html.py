"""HTML boilerplate-strip spec tests (the S4 + density upgrade)."""

from extractthinker_spark.operators.parse_html import (
    extract_main_text,
    parse_html_blocks,
)


def test_removes_script_style_nav_footer_head():
    html = (
        "<html><head><title>T</title><style>.x{}</style>"
        "<script>var a=1;</script></head><body>"
        "<nav>Home | About</nav><p>Main content here.</p>"
        "<footer>© corp</footer></body></html>"
    )
    assert extract_main_text(html) == "Main content here."


def test_link_farm_dropped_article_kept():
    html = (
        "<body><article><h1>Title Words</h1><p>Real paragraph text.</p></article>"
        '<div><a href="/a">link one</a> <a href="/b">link two</a> '
        '<a href="/c">link three</a></div></body>'
    )
    assert extract_main_text(html) == "Title Words Real paragraph text."


def test_entities_unescaped():
    assert extract_main_text("<p>Tom &amp; Jerry &lt;3</p>") == "Tom & Jerry <3"


def test_numeric_and_named_entities_full_html5():
    """bs4 get_text() parity on non-ASCII pages (VERDICT r2 missing
    #5): decimal and hex numeric refs, extended named entities, and
    the windows-1252 C1 remapping all decode; &nbsp; stays a plain
    space."""
    assert extract_main_text("<p>caf&#233; r&eacute;sum&#xe9;</p>") == (
        "café résumé"
    )
    assert extract_main_text("<p>it&#x2019;s &#8212; fine</p>") == "it’s — fine"
    # HTML5 maps the C1 range through windows-1252: &#146; is ’
    assert extract_main_text("<p>don&#146;t</p>") == "don’t"
    assert extract_main_text("<p>a&nbsp;b</p>") == "a b"
    # an invalid reference yields the replacement character, not junk
    assert extract_main_text("<p>x&#0;y</p>") == "x�y"


def test_nested_removed_subtree():
    html = "<div><script>if (a<b) { x(); }</script>kept</div>"
    assert extract_main_text(html) == "kept"


def test_whitespace_normalized():
    html = "<p>a\n   b</p><p>c  d</p>"
    assert extract_main_text(html) == "a b c d"


def test_empty_and_none():
    assert extract_main_text("") == ""
    assert extract_main_text(None) == ""


def test_block_stats():
    html = '<body><p>long enough plain text block</p><p><a href="x">all link</a></p></body>'
    blocks = parse_html_blocks(html)
    assert len(blocks) == 2
    assert blocks[0].link_density() == 0.0
    assert blocks[1].link_density() > 0.9
    assert blocks[0].text_density() > 0


def test_token_truncation_applied():
    html = "<p>" + ("word " * 500) + ".</p>"
    out = extract_main_text(html, max_tokens=50)
    assert out.endswith("...")


def test_comments_and_doctype_stripped():
    html = "<!DOCTYPE html><!-- hidden -->\n<p>visible</p>"
    assert extract_main_text(html) == "visible"


def test_deterministic():
    html = "<body><p>stable output</p></body>"
    assert extract_main_text(html) == extract_main_text(html)


def test_html_to_markdown_golden(spark):
    """MarkItDown-subset conversion (S9): headings/list/quote/pre map
    to markdown, boilerplate link farms drop, block order preserved."""
    import pyspark.sql.functions as F

    from extractthinker_spark.operators.parse_html import (
        html_to_markdown,
        html_to_markdown_udf,
    )

    html = (
        "<html><head><script>x</script></head><body>"
        "<h1>Title</h1><p>Intro text here.</p>"
        "<h2>Section</h2><ul><li>one</li><li>two</li></ul>"
        "<blockquote>quoted words</blockquote>"
        "<pre>code block</pre>"
        '<div><a href="/a">nav1</a> <a href="/b">nav2</a></div>'
        "<footer>foot</footer></body></html>"
    )
    want = (
        "# Title\n\nIntro text here.\n\n## Section\n\n- one\n\n- two"
        "\n\n> quoted words\n\n```\ncode block\n```"
    )
    assert html_to_markdown(html) == want
    # link farm kept when boilerplate gate is off
    assert "nav1 nav2" in html_to_markdown(html, drop_boilerplate=False)

    df = spark.createDataFrame([(1, html)], "i int, h string")
    got = df.select(html_to_markdown_udf(F.col("h")).alias("md")).collect()
    assert got[0]["md"] == want
