"""Similarity search over embedding columns (array<float>).

Two paths (driver brief):
  * brute-force cosine top-k — exact baseline. Queries are broadcast
    (small side), corpus streams; dot product is a zip_with/aggregate
    fold (JVM, no Python). One shuffle for the per-query top-k.
  * LSH-bucketed ANN — random-hyperplane signatures (deterministic,
    seeded via xxhash64 of (plane, dim)), candidates share a bucket in
    at least one of several hash tables, exact cosine re-rank within
    candidates. The 100 TB path: corpus-side work is a narrow map +
    bucket-key shuffle; no cross join ever materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_arrow(a: Column, b: Column) -> Column:
    """Bit-exact Arrow twin of :func:`cosine` for bulk pair scoring.

    Accumulates the dot product and both squared norms dimension-by-
    dimension (``acc = acc + x_d*y_d`` in index order, vectorized over
    the pair axis) — the EXACT IEEE add sequence of the interpreted
    zip_with/aggregate fold and of the DuckDB list_reduce twin, so the
    scores are bit-identical, not merely close (NOTES.md float
    protocol). Use for large candidate sets; ``cosine`` remains the
    cross-engine parity spec."""

    @F.pandas_udf("double")
    def _cos(av: pd.Series, bv: pd.Series) -> pd.Series:
        if len(av) == 0:
            return pd.Series([], dtype="float64")
        A = np.stack([np.asarray(v, dtype=np.float64) for v in av])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in bv])
        n = A.shape[0]
        d_acc = np.zeros(n)
        na = np.zeros(n)
        nb = np.zeros(n)
        for d in range(A.shape[1]):
            ad = A[:, d]
            bd = B[:, d]
            d_acc = d_acc + ad * bd
            na = na + ad * ad
            nb = nb + bd * bd
        with np.errstate(divide="ignore", invalid="ignore"):
            return pd.Series(d_acc / (np.sqrt(na) * np.sqrt(nb)))

    return _cos(a, b)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine: queries ship to every corpus partition,
    scores come back as small (query_id, neighbor_id, cos) rows.

    Output: (query_id, neighbor_id, cos_sim, rank), excluding self.

    Scale/impl notes: the query side is collected to the driver — the
    same smallness bound as the broadcast crossJoin it replaces (a
    broadcast builds its relation on the driver too). Scoring is one
    mapInPandas over the corpus (narrow, no pair materialization in
    the JVM): per Arrow batch, numpy accumulates the dot product and
    norms dimension-by-dimension — ``acc = acc + x_d*y_d`` in index
    order, the EXACT left-fold IEEE sequence of the previous
    zip_with/aggregate expressions (which Catalyst runs interpreted,
    ~20x slower at 64 dims) and of the DuckDB list_reduce oracle, so
    cos_sim is bit-identical. Only scalar scores leave Python; the
    corpus vectors cross into Arrow once and no payload is shuffled —
    the per-query top-k shuffles 3-scalar rows only.
    """
    q_rows = queries.select(key, vec_col).collect()
    if not q_rows:
        qid_type = dict(queries.dtypes)[key]
        nid_type = dict(corpus.dtypes)[key]
        return corpus.sparkSession.createDataFrame(
            [],
            f"query_id {qid_type}, neighbor_id {nid_type}, "
            "cos_sim double, rank int",
        )
    qids = [r[0] for r in q_rows]
    Q = np.stack([np.asarray(r[1], dtype=np.float64) for r in q_rows])
    dim = Q.shape[1]
    # query norms with the same left fold (scalar accumulation order
    # over dims is what matters; one value per query)
    qn = np.zeros(len(qids), dtype=np.float64)
    for d in range(dim):
        qn = qn + Q[:, d] * Q[:, d]
    qn = np.sqrt(qn)
    qid_type = dict(queries.dtypes)[key]
    nid_type = dict(corpus.dtypes)[key]
    out_schema = (
        f"query_id {qid_type}, neighbor_id {nid_type}, cos_sim double"
    )

    def score(batches):
        qids_arr = np.asarray(qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            n = len(pdf)
            dots = np.zeros((n, len(qids)), dtype=np.float64)
            cn = np.zeros(n, dtype=np.float64)
            for d in range(dim):
                cd = C[:, d]
                dots = dots + cd[:, None] * Q[None, :, d]
                cn = cn + cd * cd
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = dots / (qn[None, :] * np.sqrt(cn)[:, None])
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids_arr, n),
                    "neighbor_id": np.repeat(pdf[key].values, len(qids)),
                    "cos_sim": cos.ravel(),
                }
            )

    scored = (
        corpus.select(key, vec_col)
        .mapInPandas(score, schema=out_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def cosine_near_dups(
    df: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    exact: bool = False,
    tables: int = 8,
    planes_per_table: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cos >= threshold).

    exact=True materializes the a<b self-join — the correctness oracle
    path, viable only on small slices. The scale path (default) is the
    LSH-bucket candidate join: corpus-side work is a narrow map + one
    shuffle on (table, bucket); no O(n^2) cross product ever exists,
    so it holds at 10^9 vectors (recall < 1 by design — more tables =
    higher recall; near-dup pairs at cos>=0.95 collide with high
    probability under random-hyperplane LSH).
    """
    a = df.select(F.col(key).alias("a"), F.col(vec_col).alias("av"))
    b = df.select(F.col(key).alias("b"), F.col(vec_col).alias("bv"))
    if exact:
        cands = a.join(b, F.col("a") < F.col("b"))
    else:
        if dim is None:
            dim = _infer_dim(df, vec_col)

        def bucketed(side: DataFrame, kname: str, vname: str) -> DataFrame:
            return side.select(
                kname, vname,
                F.explode(F.array(*[
                    F.struct(
                        F.lit(t).alias("table"),
                        lsh_bucket(F.col(vname), t, planes_per_table, dim).alias("bucket"),
                    )
                    for t in range(tables)
                ])).alias("e"),
            ).select(kname, vname, "e.table", "e.bucket")

        cands = (
            bucketed(a, "a", "av")
            .join(bucketed(b, "b", "bv"), ["table", "bucket"])
            .filter(F.col("a") < F.col("b"))
            .select("a", "av", "b", "bv")
            .dropDuplicates(["a", "b"])
        )
    return (
        cands.select(
            "a", "b", F.round(cosine(F.col("av"), F.col("bv")), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )


import functools
import hashlib


@functools.lru_cache(maxsize=4096)
def _plane_constants(plane: int, dim: int) -> tuple[float, ...]:
    """Hyperplane components: pseudo-uniform in ~(-0.5, 0.5), derived
    from md5(plane_dim) — identical arithmetic in python, Spark md5,
    and DuckDB md5, so an ANSI-SQL oracle rebuilds the same planes.
    Computed ONCE on the driver and shipped as literals: the previous
    formulation derived them with per-row hash expressions, recomputing
    the same (plane, dim) constant for every vector (~10x slower)."""
    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"{plane}_{d}".encode()).hexdigest()[:15], 16)
        out.append(((h % 10007) - 5003) / 10007.0)
    return tuple(out)


def _hyperplane_sign(vec: Column, plane: int, dim: int) -> Column:
    """Sign bit of <vec, h_plane>; the plane is a literal array, the
    dot product a single left fold (order matches the SQL oracle)."""
    consts = F.array(*[F.lit(c) for c in _plane_constants(plane, dim)])
    proj = F.aggregate(
        F.zip_with(vec, consts, lambda v, c: v * c),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )
    return F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket(
    vec: Column, table: int, planes_per_table: int = 8, dim: int = 64
) -> Column:
    """Bucket id for one hash table: the concatenated sign bits."""
    bits = F.lit(0).cast("long")
    for p in range(planes_per_table):
        bits = bits * 2 + _hyperplane_sign(
            vec, table * planes_per_table + p, dim
        )
    return bits


def lsh_buckets_arrow(
    vec_col: Column, tables: int, planes_per_table: int, dim: int
) -> Column:
    """All hash-table buckets in one vectorized matmul (Arrow batch):
    array<long> of length ``tables``. ~20x the expression fold (which
    evaluates interpreted lambdas per (vector, plane, dim)); bit-equal
    signs in practice — projections sit far above float64 reordering
    noise (min |proj| ~ 1e-6 on the test corpus vs ~1e-16 noise), and
    the DuckDB oracle pins it empirically every round."""
    n_planes = tables * planes_per_table
    C = np.stack(
        [np.array(_plane_constants(p, dim)) for p in range(n_planes)]
    ).T  # dim x n_planes
    weights = np.array(
        [1 << (planes_per_table - 1 - p) for p in range(planes_per_table)],
        dtype=np.int64,
    )

    @F.pandas_udf("array<long>")
    def _buckets(vs: pd.Series) -> pd.Series:
        out = []
        ok = vs.notna()
        if ok.any():
            M = np.stack([np.asarray(v, dtype=np.float64) for v in vs[ok]])
            S = (M @ C) > 0
            B = S.reshape(len(M), tables, planes_per_table) @ weights
            it = iter(B)
        for is_ok in ok:
            out.append([int(x) for x in next(it)] if is_ok else None)
        return pd.Series(out)

    return _buckets(vec_col)


def dist2(a: Column, b: Column) -> Column:
    """Squared euclidean distance as a single left fold in index order
    — the SAME summation order a SQL list_reduce twin uses, so both
    engines execute the identical sequence of IEEE-double adds."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _cent_literals(cents: list[list[float]]) -> Column:
    """Centroids as a literal array<struct<d... , list_id>> — the
    broadcast-dimension pattern (tiny, shipped in the plan)."""
    return F.array(
        *[
            F.struct(
                F.array(*[F.lit(x) for x in c]).alias("c"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(cents)
        ]
    )


def _assign_expr(vec: Column, cent_arr: Column) -> Column:
    """Nearest-centroid id with a deterministic (d2, list_id) tie-break:
    array_min over struct<d2,list_id> — a narrow map, no shuffle."""
    return F.array_min(
        F.transform(
            cent_arr,
            lambda s: F.struct(
                dist2(vec, s["c"]).alias("d2"), s["list_id"].alias("list_id")
            ),
        )
    )["list_id"]


def _assign_arrow(vec_col: Column, cents: list[list[float]]) -> Column:
    """Nearest-centroid id via one numpy distance matrix per Arrow
    batch — the scale path for assignment (the expression fold is an
    interpreted per-(row, centroid, dim) lambda; measured the same ~20x
    gap as the LSH signatures). numpy argmin takes the FIRST minimum,
    i.e. the same (d2, list_id) tie-break as the expr path. Selection
    only: output cos_sim values still come from the JVM fold over the
    original vectors, so they stay bit-equal to the SQL oracle (the
    LSH-signature precedent; distance reordering noise ~1e-15 vs
    assignment gaps ~1e-5)."""
    C = np.asarray(cents, dtype=np.float64)

    @F.pandas_udf("int")
    def _assign(vs: pd.Series) -> pd.Series:
        out = []
        ok = vs.notna()
        if ok.any():
            M = np.stack([np.asarray(v, dtype=np.float64) for v in vs[ok]])
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            it = iter(d2.argmin(axis=1))
        return pd.Series(
            [int(next(it)) if o else None for o in ok], dtype="Int32"
        )

    return _assign(vec_col)


def _probe_arrow(vec_col: Column, cents: list[list[float]], n_probe: int) -> Column:
    """The n_probe nearest centroid ids per query, (d2, list_id)-
    ordered (stable argsort), as array<int> — numpy twin of the
    slice(array_sort(...)) probe."""
    C = np.asarray(cents, dtype=np.float64)

    @F.pandas_udf("array<int>")
    def _probe(vs: pd.Series) -> pd.Series:
        out = []
        ok = vs.notna()
        if ok.any():
            M = np.stack([np.asarray(v, dtype=np.float64) for v in vs[ok]])
            d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            it = iter(idx)
        return pd.Series(
            [[int(x) for x in next(it)] if o else None for o in ok]
        )

    return _probe(vec_col)


def _ivf_search(
    assigned: DataFrame,
    queries: DataFrame,
    cents: list[list[float]],
    key: str,
    vec_col: str,
    k: int,
    n_probe: int,
    impl: str = "expr",
) -> DataFrame:
    """Shared IVF search: per-query probe of the ``n_probe`` nearest
    cells ((d2, list_id)-ordered), join on list_id, exact-cosine
    re-rank. Search touches n_probe/n_lists of the corpus — the FAISS
    recall/cost dial. ``impl='arrow'`` selects probes with numpy (scale
    path); 'expr' is the pure-Catalyst cross-engine parity spec."""
    if impl == "arrow":
        q = queries.select(
            F.col(key).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(
                _probe_arrow(F.col(vec_col), cents, n_probe)
            ).alias("list_id"),
        )
    else:
        cent_arr = _cent_literals(cents)
        dists = F.transform(
            cent_arr,
            lambda s: F.struct(
                dist2(F.col(vec_col), s["c"]).alias("d2"),
                s["list_id"].alias("list_id"),
            ),
        )
        probes = F.slice(F.array_sort(dists), 1, n_probe)
        q = queries.select(
            F.col(key).alias("query_id"),
            F.col(vec_col).alias("qv"),
            F.explode(probes).alias("p"),
        ).select("query_id", "qv", F.col("p.list_id").alias("list_id"))

    cos_fn = cosine_arrow if impl == "arrow" else cosine
    scored = (
        q.join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos_fn(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ann_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    train_rows: int | None = None,
    corpus_rows: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN, production path: seeded KMeans
    partitions the corpus into ``n_lists`` cells; each query probes its
    ``n_probe`` nearest centroids and exact-cosine re-ranks within
    those cells only.

    ``train_rows`` caps the KMeans fit at ~256×n_lists vectors (the
    FAISS convention) — at 10^9 vectors a full-corpus fit is a
    multi-pass job over every vector for no recall gain. Pass
    ``corpus_rows`` (a row-count hint, e.g. from table metadata) to
    draw the training set as a seeded Bernoulli sample; without it NO
    pre-fit count job is scheduled — the fit trains on
    ``limit(train_rows)``, an early-terminating scan (fine for
    clustering quality unless the storage order is adversarial, in
    which case supply the hint). Assignment of the full corpus is a
    narrow map either way. Same output schema as brute_force_topk;
    recall < 1 by design. For a value-level cross-engine-checkable
    variant see ann_topk_ivf_portable.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if train_rows is None:
        train_rows = 256 * n_lists
    if corpus_rows is not None and corpus_rows > train_rows:
        # seeded Bernoulli sample, slightly over-drawn so the fit sees
        # ~train_rows vectors (exact count is irrelevant to KMeans)
        train = corpus.sample(
            min(1.0, 1.1 * train_rows / corpus_rows), seed=seed
        )
    else:
        train = corpus.limit(train_rows)
    train_v = train.withColumn("_v", array_to_vector(F.col(vec_col)))
    model = KMeans(
        k=n_lists, seed=seed, featuresCol="_v", predictionCol="_list"
    ).fit(train_v)

    cents = [list(map(float, c)) for c in model.clusterCenters()]
    assigned = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        _assign_arrow(F.col(vec_col), cents).alias("list_id"),
    )
    return _ivf_search(
        assigned, queries, cents, key, vec_col, k, n_probe, impl="arrow"
    )


def portable_sample_pred(key_col: Column, pct: int) -> Column:
    """Deterministic cross-engine sampling predicate: the md5-derived
    60-bit hash of the stringified key, mod 100 — identical in Spark
    and ANSI SQL (('0x' || substring(md5(k),1,15))::BIGINT % 100)."""
    h = F.conv(
        F.substring(F.md5(key_col.cast("string").cast("binary")), 1, 15), 16, 10
    ).cast("long")
    return (h % 100) < pct


def lloyd_centroids_portable(
    corpus: DataFrame,
    key: str,
    vec_col: str,
    n_lists: int,
    iters: int = 2,
    sample_pct: int | None = None,
    impl: str = "expr",
    corpus_rows: int | None = None,
) -> list[list[float]]:
    """Deterministic, cross-engine-derivable IVF centroids.

    Init = the ``n_lists`` training vectors at key-ranks floor(i*n/k)
    (evenly spaced in key order), then ``iters`` Lloyd rounds:
    assignment by (d2, list_id)-tie-broken argmin, update by per-
    dimension mean, empty cells keep their previous centroid. Every
    step is plain arithmetic an ANSI-SQL oracle replays exactly (same
    fold order for d2; means differ only by float summation order,
    ~1e-16 — far below the ~1e-5 assignment-gap margin, the same
    argument as the LSH planes).

    Scale shape: training runs on the ``sample_pct`` portable sample.
    ``None`` (the default) DERIVES the smallest percentage keeping
    ~256×n_lists training rows (FAISS convention) — from the
    ``corpus_rows`` hint (table metadata) with NO job scheduled, or
    from a count job when no hint is given; pass an explicit
    percentage when an oracle must replay the sampling. Per-round
    driver traffic is n_lists×dim doubles (the collected means), never
    vectors. The global row_number for init runs on the SAMPLE only —
    a single-partition sort of a bounded set, not the corpus — and the
    sample size it needs rides a count window on that same sort, so
    init is ONE job, not a count plus a collect.
    """
    train = corpus.select(F.col(key).alias("_k"), F.col(vec_col).alias("v"))
    if sample_pct is None:
        target = 256 * n_lists
        if corpus_rows is not None:
            n0 = corpus_rows
        else:
            # documented fallback: a count job at plan-build. Pass
            # corpus_rows (table metadata) to avoid it — the
            # ann_topk_ivf pattern.
            n0 = train.count()
        sample_pct = min(100, max(1, -(-100 * target // max(1, n0))))
    if sample_pct < 100:
        train = train.filter(portable_sample_pred(F.col("_k"), sample_pct))
    # Materialize the bounded training sample ONCE: the init job and
    # every Lloyd round re-read ``train``, and the sampling predicate
    # is not pushable, so without this each of the (iters+1) jobs
    # re-scans the full corpus. The sample is ~256×n_lists vectors by
    # construction — localCheckpoint cost is trivial and row values
    # are unchanged (the oracle replays the same sample).
    train = train.localCheckpoint()
    if impl == "arrow":
        # The whole Lloyd loop runs on the DRIVER over the collected
        # bounded sample (same boundedness class as the centroid
        # collects the expr path already does per round): one job
        # instead of 1 init + 2·iters driver-blocking jobs. Numpy
        # assignment is the same first-min argmin as _assign_arrow;
        # per-cell means differ from the expr path only by float
        # summation order (~1e-16), far below the ~1e-5 assignment-gap
        # margin — the documented selection-only protocol pinned by
        # the value-level oracle every round.
        return _lloyd_driver(train, n_lists, iters)
    # Init ranks {floor(i*n/k)+1} WITHOUT a separate count() action:
    # rank r is an init rank iff ceil((r-1)*k/n) < ceil(r*k/n) (the
    # interval [ (r-1)*k, r*k ) contains a multiple of n — identity
    # fuzz-pinned in tests), with n supplied by a count window over
    # the SAME single-partition sort row_number already requires. One
    # job total for the init instead of two.
    w = Window.orderBy("_k")
    r, n = F.col("rnk"), F.col("_n")
    k_ = F.lit(n_lists)
    is_init = (
        F.floor(((r - 1) * k_ + n - 1) / n) < F.floor((r * k_ + n - 1) / n)
    )
    init_rows = (
        train.withColumn("rnk", F.row_number().over(w))
        .withColumn("_n", F.count("*").over(Window.partitionBy()))
        .filter(is_init)
        .orderBy("rnk")
        .select("v")
        .collect()
    )
    if len(init_rows) < n_lists:
        raise ValueError(
            f"training set has {len(init_rows)} usable init rows "
            f"< n_lists={n_lists}"
        )
    cents = [list(map(float, r["v"])) for r in init_rows]
    for _ in range(iters):
        if impl == "arrow":
            assign = _assign_arrow(F.col("v"), cents)
        else:
            assign = _assign_expr(F.col("v"), _cent_literals(cents))
        assigned = train.select("v", assign.alias("list_id"))
        means = (
            assigned.select("list_id", F.posexplode("v").alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(r["list_id"], {})[r["pos"]] = r["m"]
        cents = [
            [by_list[i][p] for p in sorted(by_list[i])] if i in by_list else c
            for i, c in enumerate(cents)
        ]
    return cents


def _lloyd_driver(
    train: DataFrame, n_lists: int, iters: int
) -> list[list[float]]:
    """Driver-side twin of the portable Lloyd loop over the collected
    (bounded, localCheckpoint'ed) sample: identical init-rank
    selection (the ceil-interval identity on key-ranked rows),
    first-min argmin assignment, per-cell means, empty cells keep
    their previous centroid."""
    pdf = train.toPandas()  # Arrow path — ~10x a row collect here
    pdf = pdf.sort_values(pdf.columns[0], kind="mergesort")
    n = len(pdf)
    if n < n_lists:
        raise ValueError(
            f"training set has {n} usable init rows < n_lists={n_lists}"
        )
    # rank r (1-based) is an init rank iff the interval [(r-1)k, rk)
    # contains a multiple of n — the same identity the window path
    # evaluates
    init_idx = [
        r - 1
        for r in range(1, n + 1)
        if ((r - 1) * n_lists + n - 1) // n < (r * n_lists + n - 1) // n
    ]
    M = np.stack(
        [np.asarray(v, dtype=np.float64) for v in pdf[pdf.columns[1]]]
    )
    cents = M[init_idx].copy()
    for _ in range(iters):
        d2 = ((M[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(axis=1)  # first min == (d2, list_id) tie-break
        for c in range(n_lists):
            members = M[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return [list(map(float, c)) for c in cents]


def ann_topk_ivf_portable(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    sample_pct: int | None = None,
    impl: str = "expr",
) -> DataFrame:
    """IVF ANN with portable deterministic centroids — identical search
    to ann_topk_ivf but trainable by any ANSI engine, so the whole
    operator (sampling, seeding, Lloyd, assignment, probe, re-rank)
    gets a value-level DuckDB oracle. ``impl='arrow'`` switches the
    assignment/probe SELECTION to numpy batches (~20x the interpreted
    lambda fold) while cos_sim values stay on the JVM fold — the same
    split the LSH path uses, pinned by the oracle every round."""
    cents = lloyd_centroids_portable(
        corpus, key, vec_col, n_lists, iters=iters, sample_pct=sample_pct,
        impl=impl,
    )
    if impl == "arrow":
        assign = _assign_arrow(F.col(vec_col), cents)
    else:
        assign = _assign_expr(F.col(vec_col), _cent_literals(cents))
    assigned = corpus.select(
        F.col(key).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        assign.alias("list_id"),
    )
    return _ivf_search(
        assigned, queries, cents, key, vec_col, k, n_probe, impl=impl
    )


def _infer_dim(df: DataFrame, vec_col: str) -> int:
    row = df.select(F.size(vec_col).alias("d")).first()
    if row is None or row["d"] is None:
        raise ValueError(f"cannot infer embedding dim from empty {vec_col}")
    return int(row["d"])


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    key: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    tables: int = 4,
    planes_per_table: int = 8,
    dim: int | None = None,
    impl: str = "arrow",
) -> DataFrame:
    """Approximate top-k: candidates = bucket collisions in any table,
    exact cosine re-rank within candidates. Same output schema as
    brute_force_topk (recall < 1 by design). ``dim`` (embedding width)
    is inferred from one corpus row when not given — pass it explicitly
    in production plans. ``impl='arrow'`` computes signatures with one
    numpy matmul per Arrow batch (the scale path); ``'expr'`` is the
    pure-Catalyst fold (the cross-engine parity spec)."""
    if dim is None:
        dim = _infer_dim(corpus, vec_col)

    def bucketed(df: DataFrame, kname: str, vname: str) -> DataFrame:
        if impl == "arrow":
            bcol = lsh_buckets_arrow(
                F.col(vec_col), tables, planes_per_table, dim
            )
            return df.select(
                F.col(key).alias(kname),
                F.col(vec_col).alias(vname),
                F.posexplode(bcol).alias("table", "bucket"),
            )
        return df.select(
            F.col(key).alias(kname),
            F.col(vec_col).alias(vname),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            lsh_bucket(
                                F.col(vec_col), t, planes_per_table, dim
                            ).alias("bucket"),
                        )
                        for t in range(tables)
                    ]
                )
            ).alias("e"),
        ).select(kname, vname, "e.table", "e.bucket")

    qb = bucketed(queries, "query_id", "qv")
    cb = bucketed(corpus, "neighbor_id", "cv")
    cands = (
        qb.join(cb, ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------------------------------
# int8 embedding quantization (memory lever for the ANN store)
# --------------------------------------------------------------------------
# A 10^12-doc embedding table at float32 is ~0.3 PB for dim=768; the
# standard first lever (FAISS SQ8, ScaNN int8) is per-vector symmetric
# int8: 4x smaller scans and shuffles. Search = quantized coarse
# scoring -> exact float re-rank on the shortlist, so recall loss is
# bounded by the shortlist width, not the codec.


def quantize_embeddings(
    df: DataFrame, vec_col: str = "vec", out_col: str = "qvec"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: q_i = round(127 * x_i /
    max|x|), stored with the per-row ``scale`` = max|x| / 127 needed
    to dequantize (x ≈ q * scale). Pure Catalyst transform — the
    array shrinks 4x (tinyint vs float) in shuffles, caches and the
    state the IVF probe scans. All-zero vectors quantize to zeros
    with scale 0."""
    amax = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )
    return df.withColumn("_amax", amax).select(
        "*",
        F.when(F.col("_amax") > 0, F.col("_amax") / 127.0)
        .otherwise(F.lit(0.0)).alias(out_col + "_scale"),
        F.transform(
            F.col(vec_col),
            lambda x: F.when(
                F.col("_amax") > 0,
                F.round(x * 127.0 / F.col("_amax"), 0).cast("tinyint"),
            ).otherwise(F.lit(0).cast("tinyint")),
        ).alias(out_col),
    ).drop("_amax")


def dequantize(qvec: Column, scale: Column) -> Column:
    """int8 codes + per-row scale → array<double> approximation."""
    return F.transform(qvec, lambda q: q.cast("double") * scale)


def ann_topk_quantized(
    df: DataFrame,
    queries: DataFrame,
    key: str = "doc_id",
    vec_col: str = "vec",
    k: int = 5,
    shortlist: int = 50,
) -> DataFrame:
    """Brute-force top-k with the int8 memory layout: coarse scores on
    the quantized vectors pick a ``shortlist`` per query (the scan
    reads 1/4 the bytes), then EXACT float cosine re-ranks the
    shortlist — the returned (query_id, neighbor_id, cos_sim, rnk)
    ordering is exact-over-shortlist, so recall vs full brute force
    is governed by ``shortlist``/``k`` (pinned by test), not by
    quantization noise."""
    from pyspark.sql import Window

    qdf = quantize_embeddings(df, vec_col)
    qq = quantize_embeddings(
        queries.select(
            F.col(key).alias("query_id"), F.col(vec_col).alias("qv")
        ),
        "qv",
    )
    # Coarse scan, §8 shape: the quantized query codes are collected
    # (same smallness bound as the broadcast crossJoin they replace)
    # and the corpus streams through ONE mapInPandas emitting only
    # 3-scalar score rows — no per-pair JVM rows, no payload shuffle.
    # All coarse math is integer (int8 codes → int64 dot / squared
    # norm), so numpy matmul is EXACT regardless of summation order
    # (max |term| 127²·dim ≪ 2^63); the one double division
    # qdot/qnorm is the same two operands the expression fold divided,
    # so qscore — and therefore shortlist membership and its
    # (qscore, neighbor_id) tie-breaks — is bit-identical to the
    # previous interpreted zip_with/aggregate folds and to the DuckDB
    # oracle. The float vectors for the exact re-rank are re-attached
    # to the tiny shortlist by key join instead of riding through the
    # coarse scan.
    q_rows = qq.select("query_id", "qvec").collect()
    if not q_rows:
        qid_type = dict(queries.dtypes)[key]
        nid_type = dict(df.dtypes)[key]
        return df.sparkSession.createDataFrame(
            [],
            f"query_id {qid_type}, neighbor_id {nid_type}, "
            "cos_sim double, rnk int",
        )
    qids = [r[0] for r in q_rows]
    Qi = np.stack([np.asarray(r[1], dtype=np.int64) for r in q_rows])
    qid_type = dict(queries.dtypes)[key]
    nid_type = dict(df.dtypes)[key]
    coarse_schema = (
        f"query_id {qid_type}, neighbor_id {nid_type}, qscore double"
    )

    def coarse_score(batches):
        qids_arr = np.asarray(qids)
        m = len(qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            Ci = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["qvec"]]
            )
            n = len(pdf)
            qdot = Ci @ Qi.T  # exact: integer
            qnorm = np.sqrt((Ci * Ci).sum(axis=1).astype(np.float64))
            with np.errstate(divide="ignore", invalid="ignore"):
                qscore = np.where(
                    qnorm[:, None] > 0,
                    qdot.astype(np.float64) / qnorm[:, None],
                    -np.inf,
                )
            yield pd.DataFrame(
                {
                    "query_id": np.tile(qids_arr, n),
                    "neighbor_id": np.repeat(pdf[key].values, m),
                    "qscore": qscore.ravel(),
                }
            )

    coarse = (
        qdf.select(F.col(key), F.col("qvec"))
        .mapInPandas(coarse_score, schema=coarse_schema)
        .filter(F.col("query_id") != F.col("neighbor_id"))  # family rule
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("qscore").desc(), F.col("neighbor_id")
    )
    short = coarse.withColumn("_r", F.row_number().over(wq)).filter(
        F.col("_r") <= shortlist
    )
    # exact float re-rank over the shortlist only: attach the float
    # vectors back by key (shortlist ≪ corpus — AQE broadcasts it)
    short = short.join(
        F.broadcast(
            qq.select("query_id", "qv").dropDuplicates(["query_id"])
        ),
        "query_id",
    ).join(
        df.select(F.col(key).alias("neighbor_id"), F.col(vec_col).alias("nv")),
        "neighbor_id",
    )
    exact = short.withColumn("cos_sim", F.round(cosine(F.col("qv"), F.col("nv")), 6))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rnk", F.row_number().over(wf).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rnk")
    )
