#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tooling only; the
shipped Scala library does not depend on this).

Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out

Loads each <name>/ parquet dump written by graft.Verify, runs the
corresponding oracle SQL in DuckDB against the same sf dir, and
compares: column set (sorted by name), dtypes, row count, exact values
(rows sorted by all columns).
"""
import sys, json, os, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    # optional CORRECTNESS-style JSON evidence dump (driver format)
    json_out = os.environ.get("CHECK_ORACLE_JSON")
    results = {}
    def record(name, rows=False, schema=False, values=False,
               spark_rows=None, oracle_rows=None, err=None):
        results[name] = {"rows_match": rows, "schema_match": schema,
                         "hash_match": values, "spark_rows": spark_rows,
                         "oracle_rows": oracle_rows, "err": err}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        dump = f"{out_dir}/{name}"
        if not glob.glob(f"{dump}/*.parquet"):
            print(f"FAIL {name}: no spark dump at {dump}")
            record(name, err="no spark dump")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{dump}/*.parquet'").df()
        try:
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            record(name, err=f"oracle SQL error: {e}")
            n_fail += 1
            continue
        a, b = norm(got), norm(want)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns spark={list(a.columns)} oracle={list(b.columns)}")
            record(name, spark_rows=a.shape[0], oracle_rows=b.shape[0],
                   err="column mismatch")
            n_fail += 1
            continue
        if a.shape != b.shape:
            print(f"FAIL {name}: shape spark={a.shape} oracle={b.shape}")
            record(name, schema=True, spark_rows=a.shape[0],
                   oracle_rows=b.shape[0], err="row count mismatch")
            n_fail += 1
            continue
        bad_dtypes = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
                      if str(a[c].dtype) != str(b[c].dtype)]
        if bad_dtypes:
            print(f"WARN {name}: dtype mismatch {bad_dtypes}")
        # value compare (NaN == NaN)
        try:
            eq = True
            for c in a.columns:
                av, bv = a[c], b[c]
                if av.dtype.kind == 'f' or bv.dtype.kind == 'f':
                    ok = np.array_equal(av.astype(float).values, bv.astype(float).values, equal_nan=True)
                else:
                    ok = av.astype(object).equals(bv.astype(object))
                if not ok:
                    diff_idx = None
                    try:
                        m = ~((av == bv) | (av.isna() & bv.isna()))
                        diff_idx = list(a.index[m])[:5]
                    except Exception:
                        pass
                    print(f"FAIL {name}: col {c} differs (first rows {diff_idx})")
                    if diff_idx:
                        print(pd.concat([a.loc[diff_idx, [c]].add_suffix('_spark'),
                                         b.loc[diff_idx, [c]].add_suffix('_oracle')], axis=1))
                    eq = False
                    break
            record(name, rows=True, schema=True, values=eq,
                   spark_rows=a.shape[0], oracle_rows=b.shape[0])
            if eq:
                print(f"PASS {name} ({a.shape[0]} rows)")
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name}: compare error {e}")
            record(name, err=f"compare error: {e}")
            n_fail += 1
    if json_out:
        json.dump(results, open(json_out, "w"), indent=2, sort_keys=True)
        print(f"wrote {json_out}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
