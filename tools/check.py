#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(sbt "runMain graft.Verify <sfDir> <outDir>"), then this script runs
each oracle_sql.json query in DuckDB over the same parquet tables and
compares exactly (schema names, row count, values — floats bit-exact).
"""
import json, sys, math
import duckdb
import pyarrow.parquet as pq
import glob

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
divergence = {}
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); print(f"FAIL {name}: no spark output"); continue
    spark_tbl = pq.read_table(files[0])
    try:
        duck = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}")); print(f"FAIL {name}: duckdb error: {str(e)[:200]}"); continue
    s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck.column_names)
    if s_cols != d_cols:
        fails.append((name, f"cols {s_cols} vs {d_cols}")); print(f"FAIL {name}: cols {s_cols} vs {d_cols}"); continue
    if spark_tbl.num_rows != duck.num_rows:
        fails.append((name, f"rows {spark_tbl.num_rows} vs {duck.num_rows}")); print(f"FAIL {name}: rows {spark_tbl.num_rows} vs {duck.num_rows}"); continue
    # compare values: sort rows by all columns, stringify exactly
    def rows(tbl):
        cols = sorted(tbl.column_names)
        data = [tbl.column(c).to_pylist() for c in cols]
        def norm(v):
            if isinstance(v, float):
                return v.hex() if not math.isnan(v) else "nan"
            return repr(v)
        return sorted(tuple(norm(col[i]) for col in data) for i in range(tbl.num_rows))
    sr, dr = rows(spark_tbl), rows(duck)
    if sr != dr:
        bad = sum(1 for a, b in zip(sr, dr) if a != b)
        first = next(((a, b) for a, b in zip(sr, dr) if a != b), None)
        fails.append((name, f"{bad} differing rows"))
        print(f"FAIL {name}: {bad}/{len(sr)} differing rows\n  spark: {first[0]}\n  duck : {first[1]}")
        # divergence probe (r15): dump the first differing row per
        # column into a machine-readable artifact next to the parquet
        cols = sorted(spark_tbl.column_names)
        diff_cols = [(c, a, b) for c, a, b in zip(cols, first[0], first[1]) if a != b]
        divergence[name] = {
            "differing_rows": bad, "total_rows": len(sr),
            "first_spark": dict(zip(cols, first[0])),
            "first_duck": dict(zip(cols, first[1])),
            "differing_columns": [c for c, _, _ in diff_cols],
        }
    else:
        print(f"PASS {name} ({spark_tbl.num_rows} rows)")

# rows-only queries: just report counts
rows_only = [d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*") if d.split("/")[-1] not in oracle]
for name in sorted(rows_only):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    n = pq.read_table(files[0]).num_rows if files else -1
    print(f"ROWS {name}: {n}")

if divergence:
    with open(f"{out_dir}/divergence.json", "w") as f:
        json.dump(divergence, f, indent=1, default=repr)
    print(f"divergence detail -> {out_dir}/divergence.json")

print(f"\n{'ALL PASS' if not fails else f'{len(fails)} FAILURES'} ({len(oracle)} oracle queries)")
sys.exit(1 if fails else 0)
