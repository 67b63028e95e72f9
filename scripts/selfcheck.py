#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Usage: python scripts/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sfDir parquet tables, sorts columns by name + rows by all columns, and
compares values exactly. Prints a per-query PASS/FAIL summary.
"""
import sys, os, json, glob, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def values_equal(a, b):
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        import numpy as np
        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            return list(a) == list(b)
    except Exception:
        pass
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    result_dirs = sorted(d for d in os.listdir(out_dir)
                         if os.path.isdir(os.path.join(out_dir, d)))
    for name in result_dirs:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no parquet output"); n_fail += 1; continue
        got = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchdf()
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1; continue
        got_c, want_c = canon(got), canon(want)
        if list(got_c.columns) != list(want_c.columns):
            print(f"FAIL {name}: cols {list(got_c.columns)} vs {list(want_c.columns)}")
            n_fail += 1; continue
        if len(got_c) != len(want_c):
            print(f"FAIL {name}: rows {len(got_c)} vs {len(want_c)}")
            n_fail += 1; continue
        bad = None
        for col in got_c.columns:
            gv, wv = got_c[col].tolist(), want_c[col].tolist()
            for i, (g, w) in enumerate(zip(gv, wv)):
                if not values_equal(g, w):
                    bad = (col, i, g, w); break
            if bad: break
        if bad:
            col, i, g, w = bad
            print(f"FAIL {name}: col={col} row={i} got={g!r} want={w!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got_c)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {len(result_dirs)} total")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
