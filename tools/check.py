#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify output
against DuckDB oracles on the same parquet dir. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
(assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):
        # Spark-written table: a directory of part files (the ScaleFixture
        # layout) rather than the driver's single-file fixtures
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize types for compare
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            import datetime
            first = df[c].dropna().iloc[0] if df[c].notna().any() else None
            if isinstance(first, datetime.date):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            else:
                df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        # floats compared EXACTLY (mirrors the driver's hash compare)
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = canon(con.execute(oracle[name]).fetchdf())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fails += 1; continue
    if list(spark_df.columns) != list(duck_df.columns):
        print(f"FAIL {name}: cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
        fails += 1; continue
    if len(spark_df) != len(duck_df):
        print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
        fails += 1; continue
    # value-KIND mismatch (int vs float) fails the driver's value hash
    # even when the numbers compare equal — e.g. an un-cast DuckDB
    # sum(BIGINT) surfaces as HUGEINT -> pandas float64 while Spark
    # wrote int64. check_dtype=False below would hide it; flag it here.
    kind_bad = [c for c in spark_df.columns
                if spark_df[c].dtype.kind != duck_df[c].dtype.kind]
    if kind_bad:
        print(f"FAIL {name}: dtype kind mismatch " +
              ", ".join(f"{c}(spark={spark_df[c].dtype} duck={duck_df[c].dtype})"
                        for c in kind_bad))
        fails += 1; continue
    try:
        pd.testing.assert_frame_equal(spark_df, duck_df, check_dtype=False,
                                      check_exact=True)
        print(f"PASS {name} ({len(spark_df)} rows)")
    except AssertionError as e:
        print(f"FAIL {name}: {str(e).splitlines()[-1][:300]}")
        # show first diff rows
        neq = (spark_df != duck_df)
        if hasattr(neq, 'any'):
            mask = neq.any(axis=1)
            if mask.any():
                i = mask.idxmax()
                print("  spark:", spark_df.loc[i].to_dict())
                print("  duck :", duck_df.loc[i].to_dict())
        fails += 1

missing = set(oracle) - {os.path.basename(d) for d in glob.glob(f"{outdir}/*") if os.path.isdir(d)}
print(f"== {len(oracle)-fails}/{len(oracle)} pass ==")
sys.exit(1 if fails else 0)
