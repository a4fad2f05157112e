#!/usr/bin/env python3
"""Local differential check mimicking the driver's correctness gate:
run graft.Verify (done separately via sbt), then compare each result
parquet against DuckDB executing oracle_sql.json on the same fixtures.
Columns are sorted by name before comparison (driver semantics)."""
import sys, json, glob, os, re
import duckdb
import pandas as pd

# Same per-key filter Verify/Bench honor (regex on key names), so a
# targeted sbt Verify run can be checked without 350 spurious
# "no spark result parquet" failures.
only = os.environ.get("SPARK_GRAFT_ONLY")
only_re = re.compile(only) if only else None

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name in sorted(oracles):
    if only_re and not only_re.search(name):
        continue
    sql = oracles[name]
    res_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not res_files:
        print(f"FAIL {name}: no spark result parquet")
        fail += 1
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(res_files)])
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}")
        fail += 1
        continue
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    d = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fail += 1
        continue
    bad = []
    for c in s.columns:
        a, b = s[c], d[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = ((a == b) | (a.isna() & b.isna())).all()
                exact = eq
            else:
                eq = ((a.astype(object) == b.astype(object)) | (a.isna() & b.isna())).all()
                exact = eq
        except Exception as e:
            eq = False
            exact = False
        if not eq:
            diff_idx = None
            try:
                m = ~((a == b) | (a.isna() & b.isna()))
                diff_idx = list(s.index[m])[:3]
                bad.append((c, str(a.dtype), str(b.dtype),
                            [(a[i], b[i]) for i in diff_idx]))
            except Exception:
                bad.append((c, str(a.dtype), str(b.dtype), "cmp-error"))
    # dtype check (driver hashes values; dtype mismatch int32 vs int64 may matter)
    dt = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
          if str(s[c].dtype) != str(d[c].dtype)]
    if bad:
        print(f"FAIL {name}: value diffs {bad[:5]}")
        fail += 1
    elif dt:
        print(f"WARN {name}: dtype diffs {dt} (values match)")
        print(f"PASS {name} ({len(s)} rows, dtype warn)")
    else:
        print(f"PASS {name} ({len(s)} rows)")

print(f"\n{'ALL PASS' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)
