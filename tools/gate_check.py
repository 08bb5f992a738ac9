"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over the
same sf dir, compares row count, column names, and order-insensitive values
(exact on ints/strings, exact on quantized bigints). Usage:

    python tools/gate_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("gate-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in sqls:
            print(f"pass {name}: rows-only ({len(sdf)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            odf = con.execute(sqls[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        problems = []
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"schema {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        else:
            cols = sorted(sdf.columns)
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                av, bv = a[c], b[c]
                if av.dtype.kind in "iu" or bv.dtype.kind in "iu":
                    eq = av.astype("int64").equals(bv.astype("int64"))
                elif av.dtype.kind == "f":
                    eq = ((av - bv).abs() < 1e-9).all()
                else:
                    eq = av.astype(str).equals(bv.astype(str))
                if not eq:
                    diff = (av.astype(str) != bv.astype(str)).sum() if len(av) == len(bv) else "?"
                    problems.append(f"values differ in col {c} ({diff} rows)")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            if len(sdf) <= 12:
                print("  spark:", sdf.to_dict("records"))
                print("  duck :", odf.to_dict("records"))
            n_fail += 1
        else:
            print(f"pass {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
