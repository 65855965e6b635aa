#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with views
named after the tables in <sfDir>, and compares: column-name sets, row counts,
and values (exact for non-floats; floats reported with max abs diff).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pdir = f"{out_dir}/{name}"
        files = glob.glob(f"{pdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {pdir}")
            n_fail += 1
            continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
            duck_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        ok, msg = compare(spark_df, duck_df)
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(spark_df)} rows){': ' + msg if msg else ''}")
        else:
            n_fail += 1
            print(f"FAIL {name}: {msg}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

def compare(s, d):
    sc, dc = sorted(s.columns), sorted(d.columns)
    if sc != dc:
        return False, f"columns differ: spark={sc} duck={dc}"
    if len(s) != len(d):
        return False, f"row counts differ: spark={len(s)} duck={len(d)}"
    s, d = s[sc].reset_index(drop=True), d[sc].reset_index(drop=True)
    notes = []
    for c in sc:
        sv, dv = s[c], d[c]
        # Driver hashes raw values, so int64 1234 vs float64 1234.0 is a
        # mismatch (e.g. DuckDB sum(BIGINT) -> HUGEINT -> float64). Flag it.
        s_int = pd.api.types.is_integer_dtype(sv)
        d_int = pd.api.types.is_integer_dtype(dv)
        s_f = pd.api.types.is_float_dtype(sv)
        d_f = pd.api.types.is_float_dtype(dv)
        if (s_int and d_f) or (s_f and d_int):
            return False, (f"col {c}: dtype mismatch spark={sv.dtype} duck={dv.dtype}"
                           " (driver hash would differ; cast both sides)")
        if s_f or d_f:
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            eq = (a == b) | both_nan
            if not eq.all():
                diff = np.nanmax(np.abs(np.where(both_nan, 0, a - b)))
                i = int(np.argmin(eq))
                return False, (f"col {c}: {int((~eq).sum())}/{len(a)} rows differ,"
                               f" max|diff|={diff:.3g}, first at row {i}:"
                               f" spark={a[i]!r} duck={b[i]!r}")
        elif pd.api.types.is_datetime64_any_dtype(sv) or pd.api.types.is_datetime64_any_dtype(dv):
            a = pd.to_datetime(sv).astype("datetime64[us]")
            b = pd.to_datetime(dv).astype("datetime64[us]")
            if not (a == b).all():
                i = int(np.argmin((a == b).to_numpy()))
                return False, f"col {c}: timestamps differ, first at row {i}: {a[i]} vs {b[i]}"
            notes.append(f"{c}:ts-us-compared")
        else:
            eq = (sv.astype(object).where(pd.notna(sv), None)
                  == dv.astype(object).where(pd.notna(dv), None))
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                return False, f"col {c}: values differ, first at row {i}: {sv[i]!r} vs {dv[i]!r}"
    return True, "; ".join(notes)

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
