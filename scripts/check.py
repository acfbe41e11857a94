#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(writes <out>/<query>/ parquet dirs + oracle_sql.json), then this script
executes each oracle SQL in DuckDB over the same sf tables and compares
cell-for-cell (columns aligned by sorted name, rows in result order).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
(optional query names restrict the check — matches Verify's dev filter)
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
unknown = only - set(oracle)
if unknown:  # a typo'd filter must not report a false ALL PASS
    sys.exit(f"unknown query name(s): {', '.join(sorted(unknown))}")
fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output");  fail += 1;  continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}");  fail += 1;  continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    exp = exp[sorted(exp.columns)].reset_index(drop=True)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
        fail += 1;  continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} vs {len(exp)}");  fail += 1;  continue
    bad = []
    for c in got.columns:
        a, b = got[c], exp[c]
        # The driver's hash is dtype-sensitive: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
        # pandas float64) hash-mismatches even when every value is equal.
        # Surface that here instead of silently coercing (r6: p11).
        ai, bi = pd.api.types.is_integer_dtype(a), pd.api.types.is_integer_dtype(b)
        af_, bf_ = pd.api.types.is_float_dtype(a), pd.api.types.is_float_dtype(b)
        if (ai and bf_) or (af_ and bi):
            bad.append(f"{c} dtype skew: spark {a.dtype} vs oracle {b.dtype} "
                       f"(driver hash would mismatch — cast in the oracle SQL)")
            continue
        if pd.api.types.is_datetime64_any_dtype(a) or pd.api.types.is_datetime64_any_dtype(b):
            a = pd.to_datetime(a).astype("datetime64[us]")
            b = pd.to_datetime(b).astype("datetime64[us]")
            eq = (a == b) | (a.isna() & b.isna())
        elif pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af, bf = a.astype(float), b.astype(float)
            eq = (af == bf) | (af.isna() & bf.isna())
        else:
            eq = (a.astype(object).where(pd.notna(a), None) ==
                  b.astype(object).where(pd.notna(b), None)) | (a.isna() & b.isna())
        if not bool(eq.all()):
            i = int(np.argmin(eq.values))
            bad.append(f"{c} (first diff row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}, "
                       f"{int((~eq).sum())} cells)")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad));  fail += 1
    else:
        print(f"PASS {name} ({len(got)} rows x {len(got.columns)} cols)")
print(f"{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} oracled queries")
sys.exit(1 if fail else 0)
