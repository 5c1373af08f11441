"""Local stand-in for the driver's correctness gate.

Runs every queries() entry at sf0.01 on Spark AND its oracle_sql() twin
on DuckDB, compares row count + column names + an order-insensitive
value hash (columns sorted by name, rows sorted), prints a verdict per
query. Floats are canonicalized via repr of round(12) to absorb
engine-formatting noise the driver's hash may or may not absorb —
treat any FLOAT-DIFF here as a real risk.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> tuple[str, list[str]]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: repr(sorted(v)) if isinstance(v, (list, set)) else repr(v)
            )
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9).map(repr)
        else:
            df[c] = df[c].map(repr)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return h, cols


def main() -> None:
    import __spark_entry__ as mod
    from extractthinker_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(sdf)} rows "
                  f"({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures += 1
            continue
        sh, scols = canon(sdf)
        oh, ocols = canon(odf)
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} vs {len(odf)}")
        if scols != ocols:
            status.append(f"COLS {scols} vs {ocols}")
        if sh != oh:
            status.append("HASH-DIFF")
        if status:
            failures += 1
            print(f"FAIL  {name}: {'; '.join(status)} ({time.time()-t0:.1f}s)")
            if sh != oh and len(sdf) == len(odf) and scols == ocols:
                merged = sdf.sort_values(scols).reset_index(drop=True).compare(
                    odf[scols].sort_values(scols).reset_index(drop=True)
                )
                print(merged.head(5))
        else:
            print(f"ok    {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
