#!/usr/bin/env python
"""Local replica of the driver's correctness loop: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB at
sf0.01, compare row count, column names, and an order-insensitive value
hash. Exit non-zero on any mismatch."""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(df.columns)
    df = df[cols].copy()
    for c in cols:
        s = df[c]
        if s.dtype == "float64" or s.dtype == "float32":
            df[c] = s.astype("float64").round(9).map(lambda v: f"{v:.9f}" if pd.notna(v) else "<null>")
        else:
            df[c] = s.map(lambda v: "<null>" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    rows = sorted(df.apply(lambda r: "\x1f".join(r.values.astype(str)), axis=1).tolist())
    h = hashlib.sha1()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return len(rows), cols, h.hexdigest()


def main() -> int:
    import __spark_entry__ as entrymod
    from tag_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[1:]
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, SF_DIR).count()
                print(f"{name:36s} rows-only: {n} rows (no oracle)")
            except Exception as e:
                print(f"{name:36s} ERROR running spark side: {e}")
                failures.append(name)
            continue
        try:
            sdf = fn(spark, SF_DIR).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            sn, scols, shash = canon(sdf)
            on, ocols, ohash = canon(odf)
            ok = (sn == on) and (scols == ocols) and (shash == ohash)
            status = "OK " if ok else "MISMATCH"
            print(f"{name:36s} {status} spark={sn} oracle={on} cols={'=' if scols == ocols else (scols, ocols)} hash={'=' if shash == ohash else (shash[:8], ohash[:8])}")
            if not ok:
                failures.append(name)
                if sn and on and scols == ocols:
                    merged = sdf.merge(odf, how="outer", indicator=True, on=list(sdf.columns))
                    diff = merged[merged["_merge"] != "both"]
                    print(diff.head(10).to_string())
        except Exception as e:
            print(f"{name:36s} ERROR: {e}")
            failures.append(name)

    # entry() smoke
    try:
        edf = entrymod.entry(spark)
        n = edf.count()
        print(f"{'entry()':36s} smoke OK: {n} rows, schema={[f.name for f in edf.schema.fields]}")
    except Exception as e:
        print(f"entry() smoke FAILED: {e}")
        failures.append("entry")

    spark.stop()
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all queries match oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())
