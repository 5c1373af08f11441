"""Bloom-filter incremental dedup: new shard vs an existing corpus.

The production dedup shapes in ``operators/dedup.py`` assume one
corpus deduped against itself. The equally common INCREMENTAL case —
"does tonight's 10^9-doc crawl shard contain documents we already
have in the 10^12-doc corpus?" — must not pay a full corpus⨯shard
join. The standard answer is a Bloom filter over corpus fingerprints:

1. **Build** (one pass over the corpus): k bit positions per document
   digest, OR-ed into a fixed m-bit array. Distributed as a
   (word → 63-bit OR) aggregation — map-side combinable, the shuffle
   carries at most ⌈m/63⌉ rows regardless of corpus size.
2. **Probe** (zero-shuffle): the collected bit array is broadcast as
   a literal and each shard row tests its k bits with pure Catalyst
   bit arithmetic. No false negatives; false-positive rate
   ≈ (1 − e^{−kn/m})^k, chosen via ``m_bits``/``k``.
3. **Verify** (exact): only Bloom-positive rows join the corpus
   digests — at realistic dup rates this join's left side is a sliver
   of the shard, which is the whole point.

Hashing is engine-portable (md5 halves + Kirsch–Mitzenmacher double
hashing, 63-bit words so no sign-bit games), so the full pipeline has
an exact DuckDB oracle. The driver-side collect is bounded by
``m_bits`` (⌈m/63⌉ longs — 2 MB at m = 2^27), same boundedness class
as the IVF centroid collect in ``similarity.py``; for filters beyond
literal-friendly size use :func:`bloom_probe_join`, which broadcasts
the word table instead.

The reference has no incremental path (its pipelines are per-document
LLM calls); this is brief-mandated LLM-pipeline tooling like the rest
of the dedup family.
"""
from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: bits per aggregated word — 63 keeps every mask positive in a signed
#: 64-bit long on BOTH engines (no sign-bit/overflow divergence)
WORD_BITS = 63


def _shl1(n: Column) -> Column:
    """1 << n with a COLUMN shift amount (F.shiftleft only takes a
    python int there; the SQL builtin accepts expressions)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), n)


def _digest_halves(col: Column) -> tuple[Column, Column]:
    """Two independent 60-bit hashes from one md5: hex nibbles 1-15
    and 17-31 (NOTES.md portable-hash scheme — identical in DuckDB via
    ('0x' || substring(md5(x), …))::BIGINT)."""
    h = F.md5(col.cast("binary"))
    return (
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long"),
        F.conv(F.substring(h, 17, 15), 16, 10).cast("long"),
    )


def bloom_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    """The k bit positions g_i = (h1 + i·h2) mod m (Kirsch &
    Mitzenmacher 2006: two hashes simulate k with no FP-rate loss).
    i·h2 stays < 2^63 for k ≤ 7; larger k folds h2 first."""
    h1, h2 = _digest_halves(col)
    if k > 7:
        h2 = h2 % F.lit(m_bits)
    return [(h1 + F.lit(i) * h2) % F.lit(m_bits) for i in range(k)]


def build_bloom(
    df: DataFrame, col: str = "text", m_bits: int = 1 << 22, k: int = 5
) -> DataFrame:
    """Distributed Bloom build: (word, bits) rows, one per NON-EMPTY
    63-bit word of the filter. Map-side combine does the heavy OR-ing;
    the shuffle moves ≤ ⌈m/63⌉ rows however large the corpus."""
    g = F.explode(F.array(*bloom_positions(F.col(col), m_bits, k))).alias("g")
    return (
        df.select(g)
        .select(
            (F.col("g") / WORD_BITS).cast("long").alias("word"),
            _shl1((F.col("g") % WORD_BITS).cast("int")).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def collect_bloom(bloom_df: DataFrame, m_bits: int) -> list[int]:
    """Dense driver-side word array (⌈m/63⌉ longs, zero-filled) from
    the sparse build — bounded by ``m_bits``, not by corpus size."""
    n = m_bits // WORD_BITS + 1
    words = [0] * n
    for r in bloom_df.collect():
        words[int(r["word"])] = int(r["bits"])
    return words


def bloom_maybe(
    col: Column, words: list[int], m_bits: int, k: int
) -> Column:
    """Pure-Catalyst membership test against a literal word array:
    true iff ALL k bits are set (no false negatives). Zero shuffle,
    zero Python — the filter rides inside whole-stage codegen. Suits
    filters up to literal-plan-friendly size (~2^20 bits); beyond
    that, :func:`bloom_probe_join`."""
    arr = F.array(*[F.lit(int(w)) for w in words])

    def probe(a: Column) -> Column:
        cond = None
        for g in bloom_positions(col, m_bits, k):
            word = F.element_at(a, (g / WORD_BITS).cast("int") + 1)
            mask = _shl1((g % WORD_BITS).cast("int"))
            c = word.bitwiseAND(mask) != 0
            cond = c if cond is None else (cond & c)
        return cond

    # _let-style single binding of the array literal (shared by all k
    # element_at probes instead of k copies of the 16k-literal array)
    return probe(arr)


def bloom_probe_join(
    shard: DataFrame,
    bloom_df: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    m_bits: int = 1 << 22,
    k: int = 5,
    out_col: str = "bloom_maybe",
) -> DataFrame:
    """Join-path probe for filters too large to inline: explode each
    shard row to its k probe words, broadcast-join the (word, bits)
    table, bool_and the k bit tests back per key. One small groupBy
    shuffle (k rows per shard doc, boolean payload)."""
    probes = shard.select(
        key,
        F.posexplode(F.array(*bloom_positions(F.col(col), m_bits, k))).alias(
            "_i", "g"
        ),
    ).select(
        key,
        (F.col("g") / WORD_BITS).cast("long").alias("word"),
        _shl1((F.col("g") % WORD_BITS).cast("int")).alias("m"),
    )
    hit = (
        probes.join(F.broadcast(bloom_df), "word", "left")
        .select(
            key,
            (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("m")) != 0).alias("_hit"),
        )
        .groupBy(key)
        .agg(F.bool_and("_hit").alias(out_col))
    )
    return shard.join(hit, key, "left")


def dedup_against_corpus(
    shard: DataFrame,
    corpus: DataFrame,
    col: str = "text",
    key: str = "doc_id",
    m_bits: int = 1 << 16,
    k: int = 5,
) -> DataFrame:
    """The composed incremental pipeline: build the corpus Bloom,
    zero-shuffle probe the shard, exact-verify ONLY the Bloom-positive
    rows against the corpus digest set. Output: shard keys +
    ``bloom_maybe`` (candidate) + ``is_dup`` (verified exact match).
    ``bloom_maybe ⊇ is_dup`` always; the gap is the FP rate.

    At 100 TB: the build is one map + a ⌈m/63⌉-row shuffle; the probe
    is a narrow map; the verify join's left side is |shard| · (dup
    rate + FP rate) rows. Corpus digests are re-scanned for the
    verify — at steady state you'd persist them bucketed by digest so
    the verify is a bucket-local join; noted here rather than
    implemented because the sink layout is deployment-specific.
    """
    words = collect_bloom(build_bloom(corpus, col, m_bits, k), m_bits)
    dig = F.md5(F.col(col).cast("binary"))
    sh = shard.select(
        key,
        dig.alias("_dig"),
        bloom_maybe(F.col(col), words, m_bits, k).alias("bloom_maybe"),
    )
    corpus_digs = corpus.select(dig.alias("_dig"))
    dups = (
        sh.filter(F.col("bloom_maybe"))
        .select(key, "_dig")
        .join(corpus_digs, "_dig", "left_semi")
        .select(key)
        .withColumn("is_dup", F.lit(True))
    )
    return (
        sh.join(dups, key, "left")
        .select(
            key,
            "bloom_maybe",
            F.coalesce(F.col("is_dup"), F.lit(False)).alias("is_dup"),
        )
    )
