#!/usr/bin/env python3
"""Regenerate the DuckDB side of BASELINE.md (dev tooling only).

Usage:
  sbt "runMain graft.Verify <sf_dir> <verify_out>"   # dumps oracle_sql.json
  python3 tools/bench_duckdb.py <sf_dir> <verify_out> [reps]

Times every oracle SQL end-to-end (fetchall) with 32 threads; reports
the WARM (last) rep per query as one JSON line, mirroring graft.Bench.
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect()
    con.sql("SET threads=32")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        else:
            continue
        # Spark writes the ns-timestamp ts column back as BIGINT nanos
        # (no ns timestamp type); restore the original TIMESTAMP view.
        # Lossless: the generated data has zero sub-microsecond parts.
        cols = {r[0]: r[1] for r in con.sql(f"DESCRIBE {t}").fetchall()}
        if cols.get("ts") == "BIGINT":
            src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
            con.sql(f"CREATE OR REPLACE VIEW {t} AS SELECT * REPLACE "
                    f"(TIMESTAMP '1970-01-01' + to_microseconds(ts // 1000) AS ts) "
                    f"FROM {src}")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    only = set(sys.argv[4:])  # optional: restrict to named queries
    times, cold = {}, {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        for r in range(reps):
            t0 = time.time()
            con.sql(oracle[name]).df()
            dt = time.time() - t0
            if r == 0:
                cold[name] = dt
        times[name] = dt
    print(json.dumps({"warm_total": round(sum(times.values()), 3),
                      "cold_total": round(sum(cold.values()), 3),
                      "queries": {k: round(v, 4) for k, v in times.items()},
                      "sf": sf_dir}))


if __name__ == "__main__":
    main()
