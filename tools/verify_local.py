#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
from oracle_sql.json in DuckDB over the sf parquet tables and compare the
result exactly (rows, sorted-by-name schema, values in row order) against
the Spark parquet dumped by graft.Verify.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [only_prefix...]
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def spark_result(d):
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl

def norm(v):
    import math, datetime, decimal
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return v

def main():
    sf, out = sys.argv[1], sys.argv[2]
    only = sys.argv[3:] if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only and not any(name.startswith(p) for p in only):
            continue
        d = os.path.join(out, name)
        st = spark_result(d)
        if st is None:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        try:
            ot = con.execute(oracles[name]).fetch_arrow_table()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}"); n_fail += 1; continue
        scols, ocols = sorted(st.column_names), sorted(ot.column_names)
        if scols != ocols:
            print(f"{name}: SCHEMA spark={scols} oracle={ocols}"); n_fail += 1; continue
        if st.num_rows != ot.num_rows:
            print(f"{name}: ROWS spark={st.num_rows} oracle={ot.num_rows}"); n_fail += 1; continue
        srows = [[norm(st.column(c)[i].as_py()) for c in scols] for i in range(st.num_rows)]
        orows = [[norm(ot.column(c)[i].as_py()) for c in scols] for i in range(ot.num_rows)]
        if srows != orows:
            bad = next(i for i in range(len(srows)) if srows[i] != orows[i])
            print(f"{name}: VALUES row {bad}: spark={srows[bad]} oracle={orows[bad]}")
            n_fail += 1
            continue
        print(f"{name}: ok ({st.num_rows} rows)")
        n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
