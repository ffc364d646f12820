#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each <outDir>/<name> parquet dir with an entry in oracle_sql.json:
run the oracle SQL in DuckDB (tables = parquet views over sfDir), then
compare rows/schema/values to the Spark result, column-sorted-by-name,
order-insensitive (sorted row hash) like the driver does.
"""
import json, sys, duckdb, glob, os

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None or v != v:
        return ""
    if isinstance(v, float):
        # pandas promotes post-join BIGINTs to float64; don't let that
        # artifact fail an integer column (the driver compares on the
        # arrow/parquet types, which stay integral).
        if v == int(v) and abs(v) < 2**53:
            return str(int(v))
        return f"{v:.6f}"
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        spark = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetch_df()
        try:
            duck = con.execute(oracle[name]).fetch_df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        s_cols, d_cols = sorted(spark.columns), sorted(duck.columns)
        if s_cols != d_cols:
            print(f"SCHEMA   {name}: spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue
        if len(spark) != len(duck):
            print(f"ROWS     {name}: spark={len(spark)} duck={len(duck)}")
            n_fail += 1
            continue
        s_rows = sorted(tuple(norm(v) for v in r)
                        for r in spark[s_cols].itertuples(index=False))
        d_rows = sorted(tuple(norm(v) for v in r)
                        for r in duck[d_cols].itertuples(index=False))
        if s_rows != d_rows:
            diff = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:3]
            print(f"VALUES   {name}: first diffs {diff}")
            n_fail += 1
            continue
        print(f"PASS     {name} ({len(spark)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
