#!/usr/bin/env python3
"""Hash-compare two GenScale fixture directories table by table.

Provenance tool for the bench fixtures: GenScale is deterministic, so a
fixture regenerated at HEAD must be bit-identical (count + sum-of-row-
hashes per table) to the on-disk fixture the BASELINE numbers were
measured on. Run after any GenScale change to prove the measured
denominators still describe the current generator output.

Usage: fixture_identity.py OLD_DIR NEW_DIR [LABEL] > evidence/....json
"""
import duckdb, json, sys

tables = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    old, new = sys.argv[1], sys.argv[2]
    label = sys.argv[3] if len(sys.argv) > 3 else f"{old} vs {new}"
    con = duckdb.connect()
    res, ok = {}, True
    for t in tables:
        a = con.execute(f"SELECT count(*), sum(hash(x)) FROM read_parquet('{old}/{t}.parquet/*.parquet') x").fetchone()
        b = con.execute(f"SELECT count(*), sum(hash(x)) FROM read_parquet('{new}/{t}.parquet/*.parquet') x").fetchone()
        same = a == b
        ok = ok and same
        res[t] = {"old": [str(v) for v in a], "new": [str(v) for v in b], "identical": same}
    print(json.dumps({"fixture": label, "all_identical": ok, "tables": res}, indent=1))
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
