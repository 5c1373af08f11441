"""Isolated curate_funnel timing (same invocation as the frozen
bench.py entry: synthetic 2000 docs, prose gates off). min-of-k.

Usage: python scripts/bench_funnel.py [runs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    runs = max(1, int(sys.argv[1])) if len(sys.argv) > 1 else 3
    from extractthinker_spark.session import get_spark

    from jobs.curate_job import main as curate_main

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-funnel", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    samples = []
    for i in range(runs):
        out_dir = tempfile.mkdtemp(prefix="bench-funnel-")
        spark.sparkContext.setJobDescription(f"curate_funnel run {i}")
        t0 = time.time()
        try:
            report = curate_main(
                ["--synthetic", "2000", "--output", out_dir,
                 "--no-c4", "--no-gopher"],
                stop=False,
            )
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)
        samples.append(round(time.time() - t0, 3))
    print(json.dumps({"query": "curate_funnel", "min": min(samples),
                      "samples": samples, "funnel": report["funnel"]}))
    spark.stop()


if __name__ == "__main__":
    main()
