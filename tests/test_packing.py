"""Sequence packing (operators/packing.py): greedy first-fit into
fixed-token-budget training sequences — determinism, budget
invariants, partition invariance, the Process hook, and the
curate_job --pack-budget stage."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from extractthinker_spark.operators.packing import pack_sequences


def _docs(spark, rows, partitions=None):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return df.repartition(partitions) if partitions else df


def test_pack_budget_invariants(spark):
    rows = [(f"d{i:03d}", "tok " * (5 * (i % 7 + 1))) for i in range(60)]
    out = pack_sequences(_docs(spark, rows), budget=40, n_groups=4).collect()
    seen: set[str] = set()
    for r in out:
        ids = r["doc_ids"].split(",")
        assert r["n_docs"] == len(ids)
        assert not (set(ids) & seen), "doc assigned twice"
        seen.update(ids)
        # within budget unless a single overweight doc
        assert r["n_tokens"] <= 40 or r["n_docs"] == 1
        assert r["seq_id"].startswith(f"{r['pack_group']}-")
        assert r["fill_frac"] == pytest.approx(
            round(r["n_tokens"] / 40, 4), abs=1e-9
        )
    assert seen == {f"d{i:03d}" for i in range(60)}


def test_pack_greedy_is_maximal(spark):
    """Greedy property: consecutive sequences in one group cannot be
    merged — the opener of sequence k+1 did NOT fit in sequence k."""
    rows = [(f"d{i:03d}", "tok " * (3 * (i % 11 + 1))) for i in range(80)]
    base = pack_sequences(_docs(spark, rows), budget=64, n_groups=2)
    rows_out = sorted(
        base.collect(),
        key=lambda r: (r["pack_group"], int(r["seq_id"].split("-")[1])),
    )
    from extractthinker_spark.functions.tokens import simple_token_count

    tok_of = {d: simple_token_count(t) for d, t in rows}
    for a, b in zip(rows_out, rows_out[1:]):
        if a["pack_group"] != b["pack_group"]:
            continue
        opener = b["doc_ids"].split(",")[0]
        assert a["n_tokens"] + tok_of[opener] > 64


def test_pack_partition_invariance_and_determinism(spark):
    rows = [(f"d{i:03d}", "word " * (i % 9 + 1)) for i in range(50)]
    a = sorted(
        map(tuple, pack_sequences(_docs(spark, rows, 2),
                                  budget=30, n_groups=4).collect())
    )
    b = sorted(
        map(tuple, pack_sequences(_docs(spark, rows, 16),
                                  budget=30, n_groups=4).collect())
    )
    assert a == b and len(a) > 1


def test_pack_overweight_doc_flagged(spark):
    rows = [("big", "tok " * 500), ("small", "tok tok")]
    out = {
        r["doc_ids"]: r
        for r in pack_sequences(_docs(spark, rows), budget=40,
                                n_groups=1).collect()
    }
    big = next(r for k, r in out.items() if "big" in k)
    assert big["n_docs"] == 1 and big["fill_frac"] > 1.0


def test_pack_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, [("a", "x")]), budget=0)


def test_process_pack_sequences_hook(spark):
    from extractthinker_spark.api import Process
    from extractthinker_spark.corpus import corpus_spark

    p = Process(spark).load(corpus_spark(spark, 40, partitions=4))
    seqs = p.pack_sequences(budget=512, n_groups=4)
    got = seqs.collect()
    assert got and {r["pack_group"] for r in got} <= set(range(4))
    n_docs = sum(r["n_docs"] for r in got)
    assert n_docs == 40


def test_curate_job_pack_stage(spark, tmp_path):
    from jobs.curate_job import main

    # synthetic invoices fail the C4/Gopher prose gates by design, so
    # disable the gates — this test pins the PACK stage, not the gates
    report = main([
        "--synthetic", "120", "--output", str(tmp_path / "run"),
        "--pack-budget", "256", "--pack-groups", "4",
        "--no-c4", "--no-gopher",
    ], stop=False)
    assert report["funnel"]["packed_sequences"] > 0
    seqs = spark.read.parquet(str(tmp_path / "run" / "sequences"))
    total = seqs.agg(F.sum("n_docs")).first()[0]
    assert total == report["funnel"]["written"]


def test_pack_chop_invariants(spark):
    """Concat-and-chop: per-doc slices partition [0, tok); every
    sequence except each group's last is exactly full; slice offsets
    tile each sequence without gaps."""
    from collections import defaultdict

    from extractthinker_spark.functions.tokens import simple_token_count
    from extractthinker_spark.operators.packing import pack_chop

    rows = [(f"d{i:03d}", "tok " * (7 * (i % 13 + 1))) for i in range(70)]
    tok_of = {d: simple_token_count(t) for d, t in rows}
    out = pack_chop(_docs(spark, rows, 4), budget=50, n_groups=4).collect()

    per_doc = defaultdict(list)
    per_seq = defaultdict(list)
    for r in out:
        assert 0 <= r["tok_start"] < r["tok_end"] <= tok_of[r["doc_id"]]
        per_doc[r["doc_id"]].append((r["tok_start"], r["tok_end"]))
        per_seq[(r["pack_group"], r["seq_id"])].append(
            (r["seq_offset"], r["tok_end"] - r["tok_start"])
        )
    # doc slices are contiguous and cover the whole doc
    for d, slices in per_doc.items():
        slices.sort()
        assert slices[0][0] == 0 and slices[-1][1] == tok_of[d]
        for (s0, e0), (s1, _e1) in zip(slices, slices[1:]):
            assert s1 == e0
    assert set(per_doc) == {d for d, _ in rows}
    # sequences tile exactly; all but the last per group are full
    last_seq = {}
    for (g, sid), parts in per_seq.items():
        idx = int(sid.split("-")[1])
        last_seq[g] = max(last_seq.get(g, -1), idx)
    for (g, sid), parts in per_seq.items():
        parts.sort()
        pos = 0
        for off, ln in parts:
            assert off == pos
            pos += ln
        if int(sid.split("-")[1]) < last_seq[g]:
            assert pos == 50, (g, sid, pos)
        else:
            assert 0 < pos <= 50


def test_pack_chop_partition_invariance(spark):
    from extractthinker_spark.operators.packing import pack_chop

    rows = [(f"d{i:03d}", "word " * (i % 9 + 1)) for i in range(40)]
    a = sorted(map(tuple, pack_chop(_docs(spark, rows, 2),
                                    budget=30, n_groups=4).collect()))
    b = sorted(map(tuple, pack_chop(_docs(spark, rows, 16),
                                    budget=30, n_groups=4).collect()))
    assert a == b and len(a) > 1
