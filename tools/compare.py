#!/usr/bin/env python3
"""Dev-only local replica of the driver's correctness gate: for each query
result parquet dumped by graft.Verify, run the corresponding oracle SQL in
DuckDB over the same testdata parquet tables and compare row sets.
Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(rows):
    out = []
    for r in rows:
        out.append(tuple(str(v) for v in r))
    return sorted(out)

def col_types(con, sql):
    """Map column name -> DuckDB logical type (e.g. BIGINT vs HUGEINT).
    The driver's hash is type-sensitive, so a value-equal HUGEINT/BIGINT
    mismatch must fail here too."""
    return {r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()}

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no result parquet"); n_fail += 1; continue
        try:
            spark_rows = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchall()
            spark_cols = [d[0] for d in con.description]
            duck = con.execute(oracle[name])
            duck_rows = duck.fetchall()
            duck_cols = [d[0] for d in duck.description]
            s_types = col_types(con, f"SELECT * FROM read_parquet({files!r})")
            d_types = col_types(con, f"({oracle[name]})")
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        # driver sorts columns by name before hashing
        s_idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        d_idx = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        if sorted(spark_cols) != sorted(duck_cols):
            print(f"FAIL {name}: columns {sorted(spark_cols)} vs {sorted(duck_cols)}")
            n_fail += 1; continue
        type_mismatch = {c: (s_types[c], d_types[c]) for c in s_types
                         if c in d_types and s_types[c] != d_types[c]}
        if type_mismatch:
            print(f"FAIL {name}: column type mismatch {type_mismatch}")
            n_fail += 1; continue
        s = norm([[r[i] for i in s_idx] for r in spark_rows])
        d = norm([[r[i] for i in d_idx] for r in duck_rows])
        if s == d:
            print(f"PASS {name} ({len(s)} rows)"); n_pass += 1
        else:
            print(f"FAIL {name}: {len(s)} vs {len(d)} rows")
            only_s = [r for r in s if r not in d][:3]
            only_d = [r for r in d if r not in s][:3]
            print(f"  spark-only: {only_s}")
            print(f"  duck-only:  {only_d}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
