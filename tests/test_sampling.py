"""Deterministic sampling/split/mix: partition-invariance, the
superset property, threshold semantics, and mixing arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.operators.sampling import (
    hash_sample,
    mix_sources,
    split_train_heldout,
    stratified_sample,
)


def _docs(spark, n=400):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string")).alias(
            "source"
        ),
    )


def test_hash_sample_partition_invariant_and_superset(spark):
    d = _docs(spark)
    a = {r.doc_id for r in hash_sample(d.repartition(1), 0.3).collect()}
    b = {r.doc_id for r in hash_sample(d.repartition(7), 0.3).collect()}
    assert a == b and 0.15 < len(a) / 400 < 0.45
    big = {r.doc_id for r in hash_sample(d, 0.6).collect()}
    assert a <= big  # same seed, larger rate → strict superset sample
    other = {r.doc_id for r in hash_sample(d, 0.3, seed="other").collect()}
    assert other != a  # independent draw
    assert hash_sample(d, 0.0).count() == 0
    assert hash_sample(d, 1.0).count() == 400
    with pytest.raises(ValueError):
        hash_sample(d, 1.5)


def test_stratified_rates_and_default(spark):
    d = _docs(spark)
    out = stratified_sample(
        d, {"src0": 1.0, "src1": 0.0}, stratum_col="source",
        default_rate=0.5,
    )
    got = out.groupBy("source").count().collect()
    by = {r.source: r["count"] for r in got}
    assert by.get("src0") == 100 and "src1" not in by
    assert 25 < by.get("src2", 0) < 75  # default rate applies


def test_split_disjoint_and_stable(spark):
    d = _docs(spark)
    s1 = split_train_heldout(d, 0.25)
    s2 = split_train_heldout(d.repartition(5), 0.25)
    m1 = {r.doc_id: r.split for r in s1.collect()}
    m2 = {r.doc_id: r.split for r in s2.collect()}
    assert m1 == m2 and set(m1.values()) == {"train", "heldout"}
    held = sum(1 for v in m1.values() if v == "heldout")
    assert 60 < held < 140


def test_mix_sources_arithmetic(spark):
    d = _docs(spark)  # 100 docs per source
    out = mix_sources(d, {"src0": 2.5, "src1": 0.5, "src2": 1.0})
    rows = out.collect()
    by = {}
    for r in rows:
        by.setdefault(r.source, []).append(r)
    assert "src3" not in by  # absent from weights → dropped
    # src2: exactly one epoch, epoch index 0
    assert len(by["src2"]) == 100
    assert {r.epoch for r in by["src2"]} == {0}
    # src0: every doc has epochs 0 and 1; a hash-chosen subset epoch 2
    n0 = len(by["src0"])
    assert 200 < n0 < 300
    per_doc = {}
    for r in by["src0"]:
        per_doc.setdefault(r.doc_id, set()).add(r.epoch)
    assert all(
        e == {0, 1} or e == {0, 1, 2} for e in per_doc.values()
    )
    # src1: half-epoch downsample — every kept doc only epoch 0, and
    # the kept set is exactly the hash_sample at the same seed
    kept = {r.doc_id for r in by["src1"]}
    ref = {
        r.doc_id
        for r in hash_sample(
            d.filter(F.col("source") == "src1"), 0.5, seed="mix"
        ).collect()
    }
    assert kept == ref
    # determinism across partitioning
    again = mix_sources(
        d.repartition(9), {"src0": 2.5, "src1": 0.5, "src2": 1.0}
    ).collect()
    assert sorted((r.doc_id, r.source, r.epoch) for r in again) == sorted(
        (r.doc_id, r.source, r.epoch) for r in rows
    )
    with pytest.raises(ValueError):
        mix_sources(d, {"src0": -1.0})
