"""URL normalization expressions — crawl-curation primitives (host
filtering, URL-level dedup) as pure Catalyst, every step with an exact
ANSI-SQL twin.

Normalization set (documented, deliberately conservative):
  * fragment stripped (``#...``),
  * scheme + authority lowercased (path/query case is significant),
  * default ports dropped (``:80`` for http, ``:443`` for https),
  * ``utm_*`` tracking parameters removed via split/filter/rejoin
    (array ops, NOT iterated regex — adjacent params make single-pass
    regex replacement wrong in both Spark and RE2),
  * an emptied query string loses its ``?``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# scheme://authority — group 1; the rest of the URL follows it
_PREFIX_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)"


def url_host(url: Column) -> Column:
    """Lowercased host (authority sans port/userinfo)."""
    auth = F.regexp_extract(url, _PREFIX_RE, 1)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(auth), r"^[a-z][a-z0-9+.\-]*://", ""),
        r"^[^@]*@", "",
    )
    return F.regexp_replace(host, r":[0-9]+$", "")


def normalize_url(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")  # fragment
    prefix = F.regexp_extract(u, _PREFIX_RE, 1)
    rest = F.regexp_replace(u, _PREFIX_RE, "")
    low = F.lower(prefix)
    low = F.regexp_replace(low, r"^(http://[^/?#]*):80$", "$1")
    low = F.regexp_replace(low, r"^(https://[^/?#]*):443$", "$1")
    u = F.concat(low, rest)
    # utm params: split the query, filter, rejoin (exact, single pass)
    base = F.regexp_replace(u, r"\?.*$", "")
    query = F.when(
        u.contains("?"), F.regexp_replace(u, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: ~p.startswith("utm_") & (F.length(p) > 0),
    )
    return F.when(
        F.size(kept) > 0,
        F.concat(base, F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(base)


def dedup_by_url(
    df: DataFrame, key: str = "doc_id", url_col: str = "url"
) -> DataFrame:
    """One row (smallest key) per normalized URL — crawl-frontier
    dedup. Aggregates on the normalized string; at corpus scale swap
    in md5 of it for a narrower shuffle key if URLs run long."""
    norm = df.select(
        F.col(key).alias("_k"), normalize_url(F.col(url_col)).alias("nurl")
    )
    return norm.groupBy("nurl").agg(F.min("_k").alias(key)).select(key, "nurl")


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
    dup_col: str | None = None,
    keep_col: str | None = None,
) -> DataFrame:
    """Per-host curation dashboard (RefinedWeb §3 keeps these exact
    statistics to pick its domain blocklists and caps): for each
    lowercased host — document count, total token count, duplicate
    rate and quality-gate reject rate, each rounded half-up to 4
    places (integer sums → ONE double division → round, the
    cross-engine float protocol from NOTES.md).

    ``dup_col``/``keep_col`` are boolean columns produced upstream
    (exact/near-dup mark, Gopher keep verdict) — pass None to skip
    the rate. ONE groupBy on the already-narrow host string; partial
    aggregation makes the shuffle carry one row per (partition, host).
    """
    from extractthinker_spark.functions.textstats import count_tokens

    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    ]
    if text_col is not None:
        aggs.append(
            F.sum(count_tokens(F.col(text_col))).cast("long")
            .alias("n_tokens")
        )
    if dup_col is not None:
        aggs.append(F.sum(F.col(dup_col).cast("long")).alias("_dups"))
    if keep_col is not None:
        aggs.append(
            F.sum((~F.col(keep_col)).cast("long")).alias("_rejects")
        )
    out = (
        df.withColumn("host", url_host(F.col(url_col)))
        .groupBy("host")
        .agg(*aggs)
    )
    if dup_col is not None:
        out = out.withColumn(
            "dup_rate", F.round(F.col("_dups") / F.col("n_docs"), 4)
        ).drop("_dups")
    if keep_col is not None:
        out = out.withColumn(
            "reject_rate", F.round(F.col("_rejects") / F.col("n_docs"), 4)
        ).drop("_rejects")
    return out


def cap_per_host(
    df: DataFrame,
    max_per_host: int,
    key: str = "doc_id",
    url_col: str = "url",
) -> DataFrame:
    """Per-domain document cap (RefinedWeb-style): keep at most
    ``max_per_host`` documents per lowercased host, deterministically
    the smallest ``key`` values, so no single template farm dominates
    the training mix. Input columns pass through unchanged plus
    ``host``.

    Scale shape: one hash exchange on host + within-partition sort
    for the row_number window, and Catalyst inserts a PARTIAL
    WindowGroupLimit below the exchange (verified in the physical
    plan), so each map task ships at most ``max_per_host`` rows per
    host — a blogspot-scale mega-host costs the shuffle N rows per
    upstream partition, not its full document count; the residual
    per-host sort spills, never OOMs.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("host").orderBy(F.col(key))
    return (
        df.withColumn("host", url_host(F.col(url_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_host)
        .drop("_rn")
    )
