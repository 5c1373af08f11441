"""Text-analysis column expressions — all pure Catalyst (JVM, codegen).

Token counting here is the SAME spec as functions/tokens.py (the
reference's simple_token_counter, utils.py:125-165) expressed as a
regexp_extract_all + aggregate fold, so the hot path never leaves the
JVM; the pandas implementation remains for UDF contexts and the two
are pinned equal by tests.

Also: document quality scoring, n-gram stopword language ID, and
content fingerprinting — the text-analysis layer a training-data
pipeline needs (driver brief), each with an exact ANSI-SQL twin in
__spark_entry__.oracle_sql().
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_CHUNK_PATTERN = r"[a-z]{1,20}|[0-9]+|[^a-z0-9\s]{1,2}"


def count_tokens(text: Column) -> Column:
    """Reference-exact token count, fully JVM-side.

    Identity used: sum(max(1, len//4)) = count(chunks) +
    sum_{len>=8}(len//4 - 1) — chunks of length 5..7 still count 1
    (7//4 == 1), so only chunks >= 8 chars contribute extra. Folding
    only those (typically <10% of chunks; higher-order lambdas are
    interpreted, not codegen'd) measured ~2x on the documents table.
    """
    chunks = F.regexp_extract_all(F.lower(text), F.lit(TOKEN_CHUNK_PATTERN), F.lit(0))
    long_chunks = F.filter(chunks, lambda t: F.length(t) >= 8)
    extra = F.aggregate(
        long_chunks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.floor(F.length(t) / 4) - 1,
    )
    return F.size(chunks).cast("long") + extra


def normalize_ws_sql(text: Column) -> Column:
    """SQL-expressible whitespace normalization (collapse all runs to a
    single space + trim). NOTE: this is the cross-engine-checkable
    subset; the reference-exact line/phrase variant lives in
    functions/tokens.py (differs only on single-space-preserving
    edge cases)."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text.
    The exact-dedup key."""
    return F.md5(F.lower(normalize_ws_sql(text)))


# --- quality scoring -------------------------------------------------------

EN_STOPWORDS = ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"]


def _count_re(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), F.lit(0)))


def quality_features(text: Column) -> dict[str, Column]:
    """Deterministic quality features (length / punctuation / digits /
    word stats / stopword ratio). Every expression has an ANSI-SQL
    equivalent, so the whole feature vector is oracle-checkable."""
    n_chars = F.length(text)
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+"), F.lit(0))
    n_words = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*EN_STOPWORDS))
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_words": n_words.cast("long"),
        "avg_word_len": F.when(
            n_words > 0, F.round(word_chars / n_words, 4)
        ).otherwise(F.lit(0.0)),
        "punct_ratio": F.when(
            n_chars > 0,
            F.round(_count_re(text, r"[^\w\s]") / n_chars, 4),
        ).otherwise(F.lit(0.0)),
        "digit_ratio": F.when(
            n_chars > 0, F.round(_count_re(text, r"[0-9]") / n_chars, 4)
        ).otherwise(F.lit(0.0)),
        "stopword_ratio": F.when(
            n_words > 0, F.round(n_stop / n_words, 4)
        ).otherwise(F.lit(0.0)),
    }


def repetition_features(
    df, key: str = "doc_id", text_col: str = "text"
):
    """Gopher-style repetition signals (Rae et al. 2021, §A1.2
    repetition filters — the standard LLM-corpus quality gate this
    module's score/feature set lacked):

      * ``dup_line_frac``       1 − distinct/total over non-empty lines
      * ``dup_line_char_frac``  chars in repeat occurrences of a line
                                (cnt−1 per group) / total line chars
      * ``top_bigram_char_frac`` chars covered by the most frequent
                                word 2-gram / total word chars (ties →
                                lexicographically greatest bigram)
      * ``dup_trigram_char_frac`` chars in repeat occurrences of word
                                3-grams / total word chars

    Character accounting uses the sum-of-occurrence convention (each
    repeat occurrence counts its gram's letters) — the tractable
    interval-free variant common to Gopher reproductions.

    Shape: gram arrays are built as pure expressions (zip_with over
    word slices — no shuffle), then ONE explode per gram family feeds
    a map-side-combinable groupBy on (key, gram) and a per-key rollup;
    every aggregate is sum/count so partial aggregation applies. Docs
    with no lines/words get 0.0 (left join back to the key set).
    """
    import pyspark.sql.functions as F  # local alias for clarity

    text = F.col(text_col)
    base = df.select(F.col(key).alias(key), text.alias("_t"))

    lines_arr = F.filter(
        F.split(F.col("_t"), "\n"), lambda l: F.length(F.trim(l)) > 0
    )
    line_stats = (
        base.select(key, F.explode(lines_arr).alias("line"))
        .groupBy(key, "line")
        .agg(F.count("*").alias("cnt"))
        .groupBy(key)
        .agg(
            F.round(1 - F.count("*") / F.sum("cnt"), 4)
            .alias("dup_line_frac"),
            F.round(
                F.sum(F.length("line") * (F.col("cnt") - 1))
                / F.sum(F.length("line") * F.col("cnt")),
                4,
            ).alias("dup_line_char_frac"),
        )
    )

    words = F.regexp_extract_all(F.lower(F.col("_t")), F.lit(r"[a-z]+"), F.lit(0))
    nw = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )

    def grams(n: int):
        parts = [
            F.slice(words, i + 1, F.greatest(nw - (n - 1), F.lit(0)))
            for i in range(n)
        ]
        g = parts[0]
        for p in parts[1:]:
            g = F.zip_with(g, p, lambda a, b: F.concat(a, F.lit(" "), b))
        return g

    wbase = base.select(key, word_chars.alias("wc"),
                        grams(2).alias("g2"), grams(3).alias("g3"))

    def gram_groups(col: str):
        return (
            wbase.select(key, "wc", F.explode(col).alias("g"))
            .groupBy(key, "g")
            .agg(
                F.count("*").alias("cnt"),
                F.first("wc").alias("wc"),
                # letters only: the joining spaces are not gram chars
                (F.length(F.first("g"))
                 - F.length(F.regexp_replace(F.first("g"), r"[a-z]", ""))
                 ).alias("gchars"),
            )
        )

    top2 = gram_groups("g2").groupBy(key).agg(
        F.round(
            F.max(F.struct(F.col("cnt"), F.col("g"), F.col("gchars")))[
                "cnt"
            ]
            * F.max(F.struct(F.col("cnt"), F.col("g"), F.col("gchars")))[
                "gchars"
            ]
            / F.first("wc"),
            4,
        ).alias("top_bigram_char_frac")
    )
    dup3 = gram_groups("g3").groupBy(key).agg(
        F.round(
            F.sum(F.col("gchars") * (F.col("cnt") - 1)) / F.first("wc"), 4
        ).alias("dup_trigram_char_frac")
    )
    keys = base.select(key)
    out = (
        keys.join(line_stats, key, "left")
        .join(top2, key, "left")
        .join(dup3, key, "left")
        .na.fill(
            0.0,
            ["dup_line_frac", "dup_line_char_frac",
             "top_bigram_char_frac", "dup_trigram_char_frac"],
        )
    )
    return out


GOPHER_THRESHOLDS: dict[str, float] = {
    # Rae et al. 2021, Table A1 (quality filtering heuristics)
    "min_words": 50,
    "max_words": 100_000,
    "min_avg_word_len": 3.0,
    "max_avg_word_len": 10.0,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_bigram_char_frac": 0.20,
    "max_dup_trigram_char_frac": 0.18,
}


def gopher_filter(
    df,
    key: str = "doc_id",
    text_col: str = "text",
    thresholds: dict | None = None,
):
    """The Gopher quality GATE: compose the word/length/stopword
    heuristics with the repetition signals into a per-document
    keep/drop decision plus the FIRST failing rule as
    ``reject_reason`` (rule order below = the order the checks are
    listed in Rae et al. Table A1; NULL reason = keep). Returns
    (key, n_words, avg_word_len, stopword_hits, the four repetition
    fractions, keep, reject_reason).

    One narrow pass for the expression features + the
    repetition_features shuffles + a co-partitioned key join — at
    corpus scale the filter costs what the repetition counters cost.
    """
    import pyspark.sql.functions as F

    t = {**GOPHER_THRESHOLDS, **(thresholds or {})}
    text = F.col(text_col)
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+"), F.lit(0))
    n_words = F.size(words)
    word_chars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    stop_hits = F.size(F.filter(words, lambda w: w.isin(*EN_STOPWORDS)))
    q = df.select(
        F.col(key).alias(key),
        n_words.cast("long").alias("n_words"),
        F.when(n_words > 0, F.round(word_chars / n_words, 4))
        .otherwise(0.0)
        .alias("avg_word_len"),
        stop_hits.cast("long").alias("stopword_hits"),
    )
    rep = repetition_features(df, key=key, text_col=text_col)
    j = q.join(rep, key)
    reason = (
        F.when(F.col("n_words") < t["min_words"], "too_few_words")
        .when(F.col("n_words") > t["max_words"], "too_many_words")
        .when(F.col("avg_word_len") < t["min_avg_word_len"], "avg_word_len")
        .when(F.col("avg_word_len") > t["max_avg_word_len"], "avg_word_len")
        .when(F.col("stopword_hits") < t["min_stopword_hits"], "stopwords")
        .when(F.col("dup_line_frac") > t["max_dup_line_frac"], "dup_lines")
        .when(
            F.col("dup_line_char_frac") > t["max_dup_line_char_frac"],
            "dup_line_chars",
        )
        .when(
            F.col("top_bigram_char_frac") > t["max_top_bigram_char_frac"],
            "top_bigram",
        )
        .when(
            F.col("dup_trigram_char_frac") > t["max_dup_trigram_char_frac"],
            "dup_trigram",
        )
    )
    return j.select(
        "*", reason.alias("reject_reason"),
        reason.isNull().alias("keep"),
    )


def quality_score(text: Column) -> Column:
    """Composite 0..1 quality score — a Gopher/C4-style heuristic gate:
    penalize too-short docs, punctuation soup, digit soup, and
    stopword-free (non-linguistic) text."""
    f = quality_features(text)
    score = (
        F.when(f["n_words"] >= 20, F.lit(0.25)).otherwise(f["n_words"] / 80)
        + F.when(f["punct_ratio"] <= 0.2, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(f["digit_ratio"] <= 0.3, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(f["stopword_ratio"] >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return F.round(score, 4)


# --- language identification ----------------------------------------------

LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "de": ["der", "und", "die", "ist", "das"],
    "fr": ["le", "et", "les", "est", "une"],
    "es": ["el", "y", "los", "es", "una"],
    "it": ["il", "e", "di", "che", "una"],
}


def lang_id(text: Column) -> Column:
    """Stopword-vote language ID. Ties break to the lexically smallest
    language code; zero hits everywhere → 'und' (undetermined)."""
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]+"), F.lit(0))

    def is_in(sws):
        return lambda w: w.isin(*sws)

    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(words, is_in(sws))).alias("hits"),
                F.lit(code).alias("code"),
            )
            for code, sws in sorted(LANG_STOPWORDS.items())
        ]
    )
    best = F.aggregate(
        scored,
        F.struct(F.lit(0).alias("hits"), F.lit("und").alias("code")),
        lambda acc, s: F.when(s["hits"] > acc["hits"], s).otherwise(acc),
    )
    return best["code"]
