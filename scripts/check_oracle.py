#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify first
(`sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"`), then
this script loads each query's parquet result, runs the corresponding
oracle SQL in DuckDB over the same tables, and compares (columns sorted by
name, rows sorted by all columns, values normalized)."""
import json, sys, glob, os
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))


# queries whose oracle is a local Python function rather than DuckDB SQL
# (none since round 13 — t19's readout became the engine-portable
# distinct-4-gram statistic with a plain DuckDB oracle; the mechanism is
# kept for any future non-SQL-expressible readout)
PY_ORACLES = {}

def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: float(v) if hasattr(v, "as_tuple") else v)
        elif str(df[c].dtype) in ("int32", "int64", "uint32", "uint64"):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) in ("float32", "float64"):
            df[c] = df[c].astype("float64")
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df

ok = fail = 0
results = {}   # per-query audit record, dumped as JSON when argv[3] given


def df_hash(df):
    """Stable digest of a normalized frame — the auditable evidence that
    the Spark result and the local oracle agreed value-for-value."""
    import hashlib
    return hashlib.sha256(
        df.round(9).to_csv(index=False).encode("utf-8")).hexdigest()[:16]


for name in sorted(set(oracle) | set(PY_ORACLES)):
    res_files = glob.glob(f"{OUT_DIR}/{name}/*.parquet")
    if not res_files:
        print(f"FAIL {name}: no spark result")
        results[name] = {"status": "fail", "err": "no spark result"}
        fail += 1
        continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in res_files], ignore_index=True)
        duck_df = PY_ORACLES[name]() if name in PY_ORACLES else con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
        results[name] = {"status": "fail",
                         "err": f"{type(e).__name__}: {str(e)[:200]}"}
        fail += 1
        continue
    s, d = normalize(spark_df), normalize(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns differ spark={list(s.columns)} duck={list(d.columns)}")
        results[name] = {"status": "fail", "err": "schema mismatch"}
        fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        results[name] = {"status": "fail",
                         "err": f"rows {len(s)} vs {len(d)}"}
        fail += 1
        continue
    try:
        pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
        print(f"OK   {name} ({len(s)} rows)")
        results[name] = {"status": "ok", "rows": int(len(s)),
                         "hash": df_hash(s),
                         "oracle": "python" if name in PY_ORACLES else "duckdb"}
        ok += 1
    except AssertionError as e:
        print(f"FAIL {name}: values differ: {str(e).splitlines()[-1][:300]}")
        # show first diffs
        neq = (s != d) & ~(s.isna() & d.isna())
        bad = neq.any(axis=1)
        print(s[bad].head(3))
        print(d[bad].head(3))
        results[name] = {"status": "fail", "err": "values differ"}
        fail += 1
print(f"\n{ok} OK, {fail} FAIL of {len(oracle)}")
if len(sys.argv) > 3:
    json.dump({"sf_dir": SF_DIR, "ok": ok, "fail": fail,
               "results": results}, open(sys.argv[3], "w"), indent=1)
    print(f"wrote {sys.argv[3]}")
sys.exit(1 if fail else 0)
