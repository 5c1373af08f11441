"""char_shingles semantics pin — the Arrow-batch shingle builder must
stay byte-exact with the original pure-Catalyst expression (per-char
split + slice + array_join + array_distinct), which these cases
replay: code-point windows (NOT UTF-16 units — astral chars are one
position), n <= k collapses to one whole-text shingle ('' included),
NULL text -> [NULL], first-occurrence distinct order, NUL bytes kept
verbatim (the numpy fixed-width dtype would strip them — such strings
must take the slicing loop), and whitespace collapsed + lowercased by
the shared normalizer before windowing.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from extractthinker_spark.operators.dedup import char_shingles


CASES = [
    # (text, k, expected)
    ("", 5, [""]),
    ("a", 5, ["a"]),
    ("abcd", 5, ["abcd"]),
    ("abcde", 5, ["abcde"]),
    ("abcdef", 5, ["abcde", "bcdef"]),
    ("ABCDEF", 5, ["abcde", "bcdef"]),           # lowercased first
    ("a  b\t\nc   d", 5, ["a b c", " b c ", "b c d"]),  # ws-normalized
    ("ababababab", 5, ["ababa", "babab"]),       # first-occurrence distinct
    ("ab\U0001F389cdef", 5,                       # astral char = ONE position
     ["ab\U0001F389cd", "b\U0001F389cde", "\U0001F389cdef"]),
    ("ab\x00cdefg", 5,                            # NUL kept verbatim
     ["ab\x00cd", "b\x00cde", "\x00cdef", "cdefg"]),
    (None, 5, [None]),
    ("abcdef", 3, ["abc", "bcd", "cde", "def"]),
]


def test_char_shingles_semantics(spark):
    rows = [(i, t) for i, (t, _, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, t string")
    for k in sorted({k for _, k, _ in CASES}):
        got = {
            r["i"]: r["sh"]
            for r in df.select(
                "i", char_shingles(F.col("t"), k).alias("sh")
            ).collect()
        }
        for i, (_, case_k, expected) in enumerate(CASES):
            if case_k != k:
                continue
            assert got[i] == expected, (i, k, got[i], expected)


def test_xxh64_matches_spark(spark):
    # The minhash signature UDF hashes shingles python-side; its XXH64
    # must be bit-identical to Spark's xxhash64(seed=42) — both the
    # vectorized fixed-width (<32 byte) path and the pure-python
    # arbitrary-length path (>= 32 bytes exercises the 4-accumulator
    # loop).
    import random

    import numpy as np

    from extractthinker_spark.operators.dedup import (
        _xxh64_any,
        _xxh64_fixed_np,
    )

    random.seed(7)
    cases = ["", "a", "abcde", "héllo", "\U0001F389xyz!", "ab\x00cd",
             "abcdefgh", "x" * 31, "y" * 32, "z" * 100]
    cases += [
        "".join(random.choice("abcXYZ 0123éü\x00\t")
                for _ in range(random.randint(0, 40)))
        for _ in range(100)
    ]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = {r["s"]: r["h"] for r in df.selectExpr("s", "xxhash64(s) h").collect()}
    for s in cases:
        b = s.encode("utf-8")
        e = _xxh64_any(b)
        e = e - (1 << 64) if e >= (1 << 63) else e
        assert e == got[s], (repr(s), e, got[s])
        if 0 < len(b) < 32:
            mat = np.frombuffer(b, dtype=np.uint8).reshape(1, len(b))
            v = int(_xxh64_fixed_np(mat).view(np.int64)[0])
            assert v == got[s], ("np", repr(s), v, got[s])


def test_minhash_signature_null_and_edge_docs(spark):
    # NULL text: the aggregation pipeline exploded [NULL] and
    # xxhash64(NULL) passes the seed (42) through — the signature is
    # the permutation family applied to h=42, NOT an array of NULLs.
    import pyspark.sql.functions as F

    from extractthinker_spark.operators.dedup import (
        _MERSENNE31,
        _perm_constants,
        minhash_signatures_df,
    )

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "abc")], "doc_id int, text string"
    )
    sigs = {
        r["_k"]: r["sig"]
        for r in minhash_signatures_df(df, "doc_id", "text").collect()
    }
    expected_null = [
        (42 * a + b) % _MERSENNE31
        for a, b in (_perm_constants(i) for i in range(64))
    ]
    assert sigs[1] == expected_null
    assert all(v is not None for v in sigs[2])
    assert all(v is not None for v in sigs[3])
    # '' shingles to [''] and 'abc' to ['abc'] — single-gram docs, so
    # every permutation sees exactly one hash
    assert len(set(len(s) for s in sigs.values())) == 1


def test_minhash_signature_duplicate_keys_union_merge(spark):
    # The old explode+groupBy pipeline aggregated ONE signature per key
    # over the union of all same-key rows' shingles. The per-row UDF +
    # element-wise min merge must reproduce that: min over a union is
    # the min of per-row minima.
    import pyspark.sql.functions as F

    from extractthinker_spark.operators.dedup import minhash_signatures_df

    dup = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (1, "epsilon zeta eta theta"),
         (2, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id int, text string",
    )
    sigs = {
        r["_k"]: r["sig"]
        for r in minhash_signatures_df(dup, "doc_id", "text").collect()
    }
    assert len(sigs) == 2
    # key 1's merged text is not the same string as key 2 (shingles
    # cross the concatenation boundary differently), but every one of
    # key 2's shingle windows that also occurs in either key-1 row
    # contributes to both; at minimum the signature must be the
    # element-wise min of the two single-row signatures:
    one = {
        r["_k"]: r["sig"]
        for r in minhash_signatures_df(
            spark.createDataFrame(
                [(10, "alpha beta gamma delta"),
                 (11, "epsilon zeta eta theta")],
                "doc_id int, text string",
            ),
            "doc_id", "text",
        ).collect()
    }
    expected = [min(a, b) for a, b in zip(one[10], one[11])]
    assert sigs[1] == expected


def test_char_shingles_numpy_path_matches_loop(spark):
    # >256 chars takes the numpy window/view path; make sure it agrees
    # with the small-string loop on a repeated pattern with a distinct
    # tail (exercises dedup across the whole window set).
    body = ("the quick brown fox jumps over the lazy dog " * 12) + "tail!"
    assert len(body) > 256
    df = spark.createDataFrame([(body,), (body[:200],)], "t string")
    out = df.select(char_shingles(F.col("t"), 5).alias("sh")).collect()
    big, small = out[0]["sh"], out[1]["sh"]

    def ref(s, k=5):
        import re

        norm = re.sub(r"\s+", " ", s.strip()).lower()
        if len(norm) <= k:
            return [norm]
        return list(dict.fromkeys(
            norm[i:i + k] for i in range(len(norm) - k + 1)
        ))

    # the shared normalizer trims + collapses ws and lowercases; the
    # reference replays that for this plain-ASCII fixture
    assert big == ref(body)
    assert small == ref(body[:200])
