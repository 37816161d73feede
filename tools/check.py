#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [options]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same parquet
tables, sorts columns by name, and hash-compares values (exact match after
canonicalizing row order by all columns).

Options (for the sf0.1 scale gate — see tools/gate_sf01.sh):
  --skip a,b        skip the oracle compare for these queries (rows-only
                    check) — e.g. q143/q149 whose brute-force all-pairs
                    oracles are quadratic in DuckDB at sf0.1
  --expect-diff a,b run the compare, but a mismatch is recorded as
                    EXPECTED_DIFF, not FAIL — e.g. q26's documented
                    probabilistic recall (over-cap LSH buckets dropped)
  --json path       write per-query results as a JSON artifact
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, skip=(), expect_diff=(), json_path=None):
    results = {}
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. MakeScale sf1.0)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    dumped = set(d for d in os.listdir(out_dir)
                 if os.path.isdir(f"{out_dir}/{d}"))
    # The oracle key set IS the expected query set (Verify writes it for
    # exactly the queries it attempted). A query that threw in Verify has
    # no dump dir — that is a FAIL, not an omission (r9: 10 thrown queries
    # were silently absent from the artifact and the gate looked green).
    names = sorted(dumped | set(oracles))
    n_pass = n_fail = 0
    for name in names:
        # A .err marker FAILs the query even when a dump dir is present:
        # Verify deletes both artifacts before each attempt, so their
        # coexistence means a stale dump survived next to a fresh error
        # (pre-r11 Verify, or a manually assembled out dir) — comparing
        # the stale data would silently pass a newly-broken query.
        err_file = f"{out_dir}/{name}.err"
        if name not in dumped or os.path.exists(err_file):
            why = ("stale dump next to .err (query threw in Verify)"
                   if name in dumped else "no dump dir (query threw in Verify)")
            if os.path.exists(err_file):
                why += ": " + open(err_file).read().strip()[:300]
            print(f"FAIL {name}: {why}"); n_fail += 1
            results[name] = {"status": "fail", "why": why}
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1
            results[name] = {"status": "fail", "why": "no spark output"}
            continue
        got = pd.read_parquet(files[0])
        if name in skip:
            status = "SKIP" if len(got) > 0 else "EMPTY!"
            print(f"{status} {name}: rows={len(got)} (oracle skipped at this SF)")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            results[name] = {"status": "skip" if len(got) > 0 else "fail",
                             "rows": len(got),
                             "why": "oracle quadratic at this SF; rows-only"}
            continue
        if name not in oracles:
            status = "ROWS" if len(got) > 0 else "EMPTY!"
            print(f"{status} {name}: rows={len(got)} (no oracle)")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            results[name] = {"status": "rows" if len(got) > 0 else "fail",
                             "rows": len(got)}
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1
            results[name] = {"status": "fail", "why": f"oracle error {e}"}
            continue
        expected = name in expect_diff
        def miss(why):
            nonlocal n_pass, n_fail
            if expected:
                print(f"EXPECTED_DIFF {name}: {why}"); n_pass += 1
                results[name] = {"status": "expected_diff", "why": why}
            else:
                print(f"FAIL {name}: {why}"); n_fail += 1
                results[name] = {"status": "fail", "why": why}
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            miss(f"cols spark={list(g.columns)} oracle={list(e.columns)}")
            continue
        if len(g) != len(e):
            miss(f"rows spark={len(g)} oracle={len(e)}")
            continue
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
            miss(f"value mismatch {bad[:3]}")
        else:
            print(f"PASS {name}: rows={len(g)}"); n_pass += 1
            results[name] = {"status": "pass", "rows": len(g)}
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_path:
        summary = {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                   "queries": results}
        with open(json_path, "w") as f:
            json.dump(summary, f, indent=1, default=str)
        print(f"wrote {json_path}")
    return 1 if n_fail else 0

def parse_args(argv):
    pos, skip, expect, json_path = [], (), (), None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--skip":
            skip = tuple(argv[i + 1].split(",")); i += 2
        elif a == "--expect-diff":
            expect = tuple(argv[i + 1].split(",")); i += 2
        elif a == "--json":
            json_path = argv[i + 1]; i += 2
        else:
            pos.append(a); i += 1
    return pos, skip, expect, json_path

if __name__ == "__main__":
    pos, skip, expect, json_path = parse_args(sys.argv[1:])
    sys.exit(main(pos[0], pos[1], skip, expect, json_path))
