#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

For each query: register the sfDir parquet tables as DuckDB views, run
the oracle SQL, load the Spark parquet output, sort columns by name,
sort rows, and compare values exactly. Prints PASS/FAIL per query.
"""
import json
import sys
import glob
import os

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(rel, cols):
    # pandas-faithful normalization (the driver compares via pandas, so
    # dtype drift like DuckDB HUGEINT -> float64 must be visible here:
    # str() of a float64 renders 3 as '3.0' while int64 renders '3').
    df = rel.df()[cols]
    out = []
    for r in df.itertuples(index=False):
        out.append(tuple(str(v) for v in r))
    return sorted(out)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            oracle_rel = con.sql(sql)
            ocols = sorted(oracle_rel.columns)
            o = norm(con.sql(f"SELECT {', '.join(ocols)} FROM oracle_rel"),
                     ocols)
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            spark_rel = con.sql(
                f"SELECT * FROM read_parquet({spark_files!r})")
            scols = sorted(spark_rel.columns)
            s = norm(con.sql(f"SELECT {', '.join(scols)} FROM spark_rel"),
                     scols)
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_fail += 1
            continue
        if ocols != scols:
            print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}")
            n_fail += 1
            continue
        if o == s:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
        else:
            print(f"FAIL {name}: oracle {len(o)} rows vs spark {len(s)} rows")
            for i, (a, b) in enumerate(zip(o, s)):
                if a != b:
                    print(f"  first diff at row {i}:\n    oracle={a}\n    spark ={b}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
