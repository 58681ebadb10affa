#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and diff. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail, ok = [], []
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fail.append((name, "no spark output"))
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        exp = con.sql(sql).df()
    except Exception as e:
        fail.append((name, f"exec error: {e}"))
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        fail.append((name, f"columns differ: spark={list(got.columns)} oracle={list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fail.append((name, f"row count differs: spark={len(got)} oracle={len(exp)}"))
        continue
    # normalize dtypes (timestamps→ns, ints→int64, decimals→float)
    for df in (got, exp):
        for c in df.columns:
            if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
                df[c] = df[c].apply(lambda b: b.hex())
            try:
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            except Exception:
                pass
    sort_cols = list(got.columns)
    got = got.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    mism = []
    for c in got.columns:
        a, b = got[c], exp[c]
        if np.issubdtype(np.asarray(a).dtype, np.floating) or np.issubdtype(np.asarray(b).dtype, np.floating):
            aa, bb = a.astype(float).values, b.astype(float).values
            # RAW bitwise comparison: the driver hashes raw bytes, so
            # -0.0 vs +0.0 (equal under ==/array_equal) AND NaN-payload
            # differences are driver hash FAILs. No NaN canonicalization —
            # canonicalizing would green-light exactly the divergence class
            # this check exists to catch; both engines emit the canonical
            # quiet NaN, so bit equality is the correct contract.
            ua = aa.view(np.uint64)
            ub = bb.view(np.uint64)
            exact = np.array_equal(ua, ub)
            if not exact and np.array_equal(aa, bb, equal_nan=True):
                # values equal but bytes differ → sign-of-zero or NaN payload
                idx = np.where(ua != ub)[0]
                mism.append((c, "BYTES-not-equal (±0.0 / NaN payload)",
                             [(int(i), aa[i], bb[i]) for i in idx[:3]]))
            elif not exact:
                close = np.allclose(aa, bb, rtol=1e-9, atol=1e-12, equal_nan=True)
                idx = np.where(~(np.isclose(aa, bb, rtol=1e-9, atol=1e-12) | (np.isnan(aa) & np.isnan(bb))))[0]
                mism.append((c, "CLOSE-not-exact" if close else "DIFF",
                             [(int(i), aa[i], bb[i]) for i in idx[:3]]))
        else:
            if not a.astype(str).equals(b.astype(str)):
                bad = np.where(a.astype(str).values != b.astype(str).values)[0]
                mism.append((c, "DIFF", [(int(i), a.iloc[i], b.iloc[i]) for i in bad[:3]]))
    if mism:
        fail.append((name, mism))
    else:
        ok.append((name, len(got)))

for name, n in ok:
    print(f"PASS {name} ({n} rows)")
for name, why in fail:
    print(f"FAIL {name}: {why}")
print(f"\n{len(ok)} pass / {len(fail)} fail")
sys.exit(1 if fail else 0)
