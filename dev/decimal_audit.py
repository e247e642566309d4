#!/usr/bin/env python3
"""Hashed-DECIMAL audit (round 16, VERDICT r15 ask #3).

The q207 saga (rounds 13-15) proved that a DECIMAL-typed column in a
HASHED oracle output rides a driver compare path where DuckDB decimal
canonicalization drifts across versions: the r15 stage-bisection probes
showed the identical integer sum green when typed BIGINT and red only
when typed DECIMAL(30,0).  This script closes the hazard CLASS: it runs
every oracle in oracle_sql.json under DuckDB and fails if any output
column's relation type is DECIMAL.  (Intermediate DECIMAL inside CTEs is
fine and deliberate - exact accumulation - as long as the final SELECT
casts to BIGINT/DOUBLE/VARCHAR.)

Usage: python3 dev/decimal_audit.py <sfDir> <verifyOutDir>
  (verifyOutDir must contain oracle_sql.json from `runMain graft.Verify`)

Round-16 baseline: 224 oracles, ZERO decimal-typed output columns.
"""
import json, os, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    sql = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    bad = {}
    for name, q in sorted(sql.items()):
        rel = con.sql(q)
        dec = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
               if "DECIMAL" in str(ty).upper()]
        if dec:
            bad[name] = dec
    if bad:
        for k, v in bad.items():
            print(f"DECIMAL-OUTPUT {k}: {v}")
        print(f"== {len(bad)} entries with hashed DECIMAL columns ==")
        return 1
    print(f"== {len(sql)} oracles, zero hashed DECIMAL columns ==")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
