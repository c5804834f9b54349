#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles: run DuckDB on oracle_sql.json
against the same parquet tables, compare to the Spark outputs Verify dumped.

Usage: python3 tools/check.py <sfDir> <outDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints (incl. duckdb hugeint->object/float) -> int64 where lossless
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            try:
                as_num = pd.to_numeric(s, errors="raise")
                df[c] = as_num
                s = df[c]
            except (ValueError, TypeError):
                pass
        if pd.api.types.is_float_dtype(s):
            nn = s.dropna()
            if len(nn) and (nn == nn.round()).all() and nn.abs().max() < 2**53:
                pass  # keep float; compare numerically below
    df = df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)
    return df


def compare(name, spark_df, duck_df):
    a, b = normalize(spark_df), normalize(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS  spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS  spark={len(a)} duck={len(b)}"
    for c in a.columns:
        x, y = a[c], b[c]
        if pd.api.types.is_float_dtype(x) or pd.api.types.is_float_dtype(y):
            x = pd.to_numeric(x, errors="coerce").astype(float)
            y = pd.to_numeric(y, errors="coerce").astype(float)
            neq = ~((x.isna() & y.isna()) | (x == y))
            if neq.any():
                i = neq.idxmax()
                exact = f"VAL   col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r} ({int(neq.sum())} diffs)"
                close = ((x - y).abs() / (1 + y.abs())).max()
                return exact + f" maxrel={close:.2e}"
        else:
            neq = ~((x.isna() & y.isna()) | (x.astype(str) == y.astype(str)))
            if neq.any():
                i = neq.idxmax()
                return f"VAL   col={c} row={i} spark={a[c][i]!r} duck={b[c][i]!r} ({int(neq.sum())} diffs)"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING spark output"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-ERR {e}"
            continue
        try:
            results[name] = compare(name, spark_df, duck_df)
        except Exception as e:
            # e.g. array columns that pandas can't sort/hash — fail just this
            # query, mirroring the ORACLE-ERR handling, not the whole run
            results[name] = f"COMPARE-ERR {type(e).__name__}: {e}"
    # queries without oracle: rows-only
    import os
    for d in sorted(os.listdir(out_dir)):
        if os.path.isdir(f"{out_dir}/{d}") and d not in oracle:
            files = glob.glob(f"{out_dir}/{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            results[d] = None if n > 0 else "ROWS-ONLY: zero rows"
    ok = sum(1 for v in results.values() if v is None)
    for name, v in sorted(results.items()):
        print(f"{'PASS' if v is None else 'FAIL'} {name}" + (f"  {v}" if v else ""))
    print(f"\n{ok}/{len(results)} pass")
    return 0 if ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
