"""Dump .explain("formatted") for declared queries to plans/<tag>/.

Usage: python scripts/explain_dump.py <tag> [sf_dir] [q1,q2,...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix from $PLAN_SUFFIX,
default "before"). Planning only — nothing is executed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as mod
    from extractthinker_spark.session import get_spark

    tag = sys.argv[1] if len(sys.argv) > 1 else "r07"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    only = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    suffix = os.environ.get("PLAN_SUFFIX", "before")

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("explain-dump", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = mod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
