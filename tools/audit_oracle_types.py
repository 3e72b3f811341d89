#!/usr/bin/env python3
"""Type audit over every oracle SQL: flag output columns whose DuckDB
type can reach the driver's canon as a FLOAT while Spark emits an exact
integer (or vice versa).

Root cause being hunted (round 11, VERDICT r10 ask #1): DuckDB
`sum(BIGINT)` returns HUGEINT and integer `//` follows its operands; a
driver DuckDB/fetch path that surfaces HUGEINT as float64 stringifies
`1234` as `1234.0`/10-sig-fig scientific while Spark's BIGINT prints
exact — rows/schema green, hash red (exactly cluster_kmeans's
signature). The fix is an explicit CAST in the oracle SQL; this script
finds every oracle that needs one.

Usage: python3 tools/audit_oracle_types.py <sfDir> <oracle_sql.json> [verifyOutDir]

With a verifyOutDir, also cross-checks the Spark parquet schema so
int-vs-float mismatches are reported exactly; without it, reports every
HUGEINT/DECIMAL/UHUGEINT oracle column as a hazard.

Development tool only — the engine never depends on it.
"""
import sys, os, json

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

HAZARD_TYPES = {"HUGEINT", "UHUGEINT"}  # + any DECIMAL(...)


def is_hazard(duck_type: str) -> bool:
    t = duck_type.upper()
    return t in HAZARD_TYPES or t.startswith("DECIMAL")


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    out_dir = sys.argv[3] if len(sys.argv) > 3 else None
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_hazard = 0
    for name in sorted(oracle):
        try:
            rows = con.execute(f"DESCRIBE {oracle[name]}").fetchall()
        except Exception as e:
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            continue
        spark_types = {}
        if out_dir:
            d = os.path.join(out_dir, name)
            if os.path.isdir(d):
                import pyarrow.parquet as pq
                fs = [f for f in os.listdir(d) if f.endswith(".parquet")]
                if fs:
                    sch = pq.read_schema(os.path.join(d, fs[0]))
                    spark_types = {n: str(t) for n, t in zip(sch.names, sch.types)}
        bad = [(c, t) for (c, t, *_rest) in rows if is_hazard(t)]
        if bad:
            n_hazard += 1
            det = ", ".join(f"{c}:{t}" +
                            (f" (spark {spark_types[c]})" if c in spark_types else "")
                            for c, t in bad)
            print(f"HAZARD {name}: {det}")
    print(f"\n{n_hazard} oracles with HUGEINT/DECIMAL output columns")


if __name__ == "__main__":
    main()
