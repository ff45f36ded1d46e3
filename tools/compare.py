#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For each query dir under verifyOutDir: load the Spark parquet result and
the DuckDB result of oracle_sql.json[name] over the sfDir tables, sort
columns by name, sort rows, and compare values exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def load(con, sf_dir):
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    load(con, sf_dir)
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir) or os.path.islink(qdir):
            continue  # skip the <name>.parquet symlink aliases
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"{name:28s} ROWS_ONLY rows={len(got)}")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:28s} ORACLE_SQL_ERROR {e}")
            n_fail += 1
            continue
        g, w = norm(got), norm(want)
        ok_shape = g.shape == w.shape
        ok_cols = list(g.columns) == list(w.columns)
        if not (ok_shape and ok_cols):
            print(f"{name:28s} SHAPE_MISMATCH got={g.shape}/{list(g.columns)} want={w.shape}/{list(w.columns)}")
            n_fail += 1
            continue
        try:
            # exact compare; allow dtype-compatible casts (e.g. int32 vs int64 we flag)
            mismatch = []
            for c in g.columns:
                gv, wv = g[c], w[c]
                if str(gv.dtype) != str(wv.dtype):
                    mismatch.append(f"dtype[{c}]: {gv.dtype} vs {wv.dtype}")
                if not gv.equals(wv):
                    neq = (gv != wv) & ~(gv.isna() & wv.isna())
                    if neq.any():
                        i = neq.idxmax()
                        mismatch.append(f"val[{c}]@{i}: {gv[i]!r} vs {wv[i]!r}")
            if mismatch:
                print(f"{name:28s} MISMATCH {'; '.join(mismatch[:4])}")
                n_fail += 1
            else:
                print(f"{name:28s} OK rows={len(g)}")
                n_pass += 1
        except Exception as e:
            print(f"{name:28s} COMPARE_ERROR {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main())
