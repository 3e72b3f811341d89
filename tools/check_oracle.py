#!/usr/bin/env python3
"""Dev-side oracle checker mirroring the driver's t2 gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with bare
table names bound to <sfDir>/<table>.parquet, and compares to the Spark
result parquet at <verifyOutDir>/<name>/. Compare = sort columns by name,
stringify values row-by-row, hash. Reports per-query PASS/FAIL.

This is a development tool only — the engine (src/main/scala) never
depends on it.
"""
import sys, os, json, hashlib
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return f"{v:.10g}"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def table_hash(names, rows):
    order = sorted(range(len(names)), key=lambda i: names[i])
    h = hashlib.sha256()
    for r in rows:
        h.update(("|".join(canon(r[i]) for i in order) + "\n").encode())
    return h.hexdigest()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    # optional extra args: restrict to these query names (iteration aid
    # mirroring Verify's subset args; the driver always runs the full set)
    only = set(sys.argv[3:])
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISS {name}: no spark result dir")
            n_fail += 1
            continue
        try:
            files = [f for f in os.listdir(spark_dir) if f.endswith(".parquet")]
            tbl = pq.read_table(os.path.join(spark_dir, files[0]))
            s_names = tbl.column_names
            s_rows = list(zip(*[tbl.column(c).to_pylist() for c in s_names])) if tbl.num_rows else []
            res = con.execute(oracle[name])
            d_names = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if sorted(s_names) != sorted(d_names):
            print(f"FAIL {name}: columns spark={sorted(s_names)} duck={sorted(d_names)}")
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue
        hs, hd = table_hash(s_names, s_rows), table_hash(d_names, d_rows)
        if hs != hd:
            print(f"FAIL {name}: hash mismatch ({len(s_rows)} rows)")
            so = sorted(range(len(s_names)), key=lambda i: s_names[i])
            do = sorted(range(len(d_names)), key=lambda i: d_names[i])
            shown = 0
            for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
                cs = [canon(sr[j]) for j in so]
                cd = [canon(dr[j]) for j in do]
                if cs != cd:
                    print(f"  row {i}: spark={cs}")
                    print(f"  row {i}:  duck={cd}")
                    shown += 1
                    if shown >= 3:
                        break
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
