#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle compare (t2).

For each query dir under OUT: read the Spark parquet result, run the
corresponding oracle SQL in DuckDB (tables = views over the sf parquet
files), sort columns by name, sort rows, exact-compare values.
Tool for local iteration only — the shipped library is pure Scala/Spark.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    import glob
    import os
    # A filtered graft.Verify run writes oracle_sql_filtered.json (never
    # oracle_sql.json) so a partial artifact can't masquerade as a full
    # surface. When the filtered file is present, compare ONLY its keys —
    # stale q_* dirs from an earlier full dump in the same outDir are not
    # this run's scope.
    filtered = f"{out_dir}/oracle_sql_filtered.json"
    if os.path.exists(filtered):
        with open(filtered) as f:
            raw = json.load(f)
        names = sorted(raw)  # every filtered query; null = rows-only
        oracles = {k: v for k, v in raw.items() if v is not None}
    else:
        with open(f"{out_dir}/oracle_sql.json") as f:
            oracles = json.load(f)
        names = sorted(set(oracles) |
                       {os.path.basename(p) for p in glob.glob(f"{out_dir}/q_*")})
    fails = 0
    for name in names:
        qdir = f"{out_dir}/{name}"
        if not os.path.isdir(qdir):
            print(f"FAIL {name}: no Spark output written")
            fails += 1
            continue
        try:
            spark_df = pd.read_parquet(qdir)
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            fails += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_df)} rows)"
                  + ("  ** EMPTY **" if len(spark_df) == 0 else ""))
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            fails += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            fails += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            fails += 1
            continue
        # exact value compare, mirroring a hash of stringified values
        mismatch = None
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                eq = (av.astype(str).values == bv.astype(str).values)
            except Exception:
                eq = av.values == bv.values
            if not eq.all():
                i = int((~eq).argmax())
                mismatch = (c, i, av.iloc[i], bv.iloc[i])
                break
        if mismatch:
            c, i, x, y = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={x!r} duck={y!r}")
            fails += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
    print(f"\n{fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
