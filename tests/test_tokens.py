"""Token counter + whitespace normalization, reference-exact semantics.

Golden counts are hand-derived from the rules in
extractthinker_spark/functions/tokens.py (which mirror
/root/reference/extract_thinker/utils.py:125-165).
"""

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from extractthinker_spark.functions.tokens import (
    count_tokens_series,
    normalize_whitespace,
    normalize_whitespace_series,
    simple_token_count,
    truncate_to_token_limit,
)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("", 0),
        (None, 0),
        ("cat", 1),                   # one short word
        ("hello", 1),                 # len 5 → 5//4 = 1
        ("extraordinary", 3),         # len 13 → 13//4 = 3
        ("a b c", 3),                 # whitespace contributes 0
        ("12345", 1),                 # digits: 5//4 = 1
        ("123456789", 2),             # 9//4 = 2
        ("!!", 1),                    # 2 specials = one chunk
        ("!!!", 2),                   # 3 specials = chunks of 2+1
        ("Hello, world!", 4),         # hello / , / world / ! → 4
    ],
)
def test_token_counts(text, expected):
    assert simple_token_count(text) == expected


def test_letter_run_chunking():
    # 25 letters → chunks of 20 + 5 → 20//4 + 5//4 = 5 + 1
    assert simple_token_count("a" * 25) == 6


def test_vectorized_matches_scalar():
    texts = [
        "", "cat", "Hello, world!", "a" * 25, "12345 + 67",
        "Invoice #00042\nTotal: 99.50", None, "   ", "é ü ñ",
    ]
    s = pd.Series(texts)
    vec = count_tokens_series(s).tolist()
    ref = [simple_token_count(t) for t in texts]
    assert vec == ref


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=300))
def test_vectorized_matches_scalar_property(text):
    assert count_tokens_series(pd.Series([text]))[0] == simple_token_count(text)


def test_normalize_whitespace():
    assert normalize_whitespace("a\n  b\n\nc") == "a b c"
    assert normalize_whitespace("x  y") == "x y"          # two-space split
    assert normalize_whitespace("  lead trail  ") == "lead trail"
    assert normalize_whitespace("") == ""
    assert normalize_whitespace(None) == ""
    # single internal space preserved verbatim
    assert normalize_whitespace("a b") == "a b"


def test_normalize_series():
    s = pd.Series(["a\nb", None, "  x  "])
    assert normalize_whitespace_series(s).tolist() == ["a b", "", "x"]


def test_truncate_noop_under_budget():
    assert truncate_to_token_limit("short text.", 100) == "short text."


def test_truncate_cuts_at_sentence():
    text = ("word " * 50 + ". ") * 20
    out = truncate_to_token_limit(text, 30)
    assert out.endswith("...")
    assert simple_token_count(out[:-3]) <= 31  # cut prefix within budget
    assert len(out) < len(text)


def test_truncate_duckdb_oracle_matches_python():
    """Regression pin for the recursive-CTE truncation oracle: DuckDB
    must replay the binary search exactly (the driver checks this at
    sf0.01; this pins it on adversarial short strings without Spark)."""
    import duckdb

    from __spark_entry__ import _truncate_sql
    from extractthinker_spark.functions.tokens import truncate_to_token_limit

    cases = [
        "",
        "short.",
        "no dots here at all " * 20,
        "a.b.c.d." * 40,
        "Sentence one. " + "word " * 120 + ". tail.",
        ". leading",
        "x" * 300 + ".",
        "Multi.\nline. text\nwith newlines. " * 10,
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(cases))
    )
    got = dict(con.execute(_truncate_sql(40) + " ORDER BY doc_id").fetchall())
    for i, t in enumerate(cases):
        assert got[i] == truncate_to_token_limit(t, 40), (i, t[:40])
