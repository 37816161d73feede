#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name, and hash-compares values (exact match after
canonicalizing row order by all columns).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.read_parquet(files[0])
        if name not in oracles:
            status = "ROWS" if len(got) > 0 else "EMPTY!"
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: cols spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows spark={len(g)} oracle={len(e)}")
            n_fail += 1; continue
        bad = []
        for c in g.columns:
            gv, ev = g[c], e[c]
            # The driver's hash gate is dtype-sensitive: a DuckDB HUGEINT
            # (SUM(BIGINT) promotion) comes back as float64 while Spark's
            # sum(long) stays int64, and 481 vs 481.0 hash-mismatch even
            # though values are equal. Flag kind crossings here so they
            # fail locally, not at the driver.
            gk, ek = gv.dtype.kind, ev.dtype.kind
            if gk != ek and not ({gk, ek} <= set('iu')):
                bad.append((c, f"dtype {gv.dtype}", f"dtype {ev.dtype}"))
                continue
            try:
                if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
                    import numpy as np
                    ok = ((gv.isna() & ev.isna()) | (gv == ev)).all()
                else:
                    ok = (gv.astype(str) == ev.astype(str)).all()
            except Exception as ex:
                ok = False
            if not ok:
                diff_idx = (gv.astype(str) != ev.astype(str))
                i = diff_idx[diff_idx].index[0] if diff_idx.any() else 0
                bad.append((c, gv.iloc[i], ev.iloc[i]))
        if bad:
            print(f"FAIL {name}: value mismatch {bad[:3]}"); n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
