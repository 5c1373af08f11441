"""Per-query noop-sink isolation bench (guide §1.4) — NOT the frozen
driver bench. Times individual declared queries (and the flagship /
funnel composites) with job descriptions set, so a Spark UI or event
log maps stages to queries. Prints one JSON line per query.

Usage:
  python bench_extra.py q1,q2,...          # default sf/cpus from env
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py classify_consensus

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf1.0),
     SPARK_GRAFT_CPUS (default 32), BENCH_RUNS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    import __spark_entry__ as mod
    from extractthinker_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    names = sys.argv[1].split(",") if len(sys.argv) > 1 else None

    spark = get_spark("bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    out = {}
    for name, fn in qs.items():
        if names and name not in names:
            continue
        samples = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.time()
            _force(fn(spark, sf_dir))
            samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({"query": name, **out[name], "sf": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
