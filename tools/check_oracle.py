#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and diff. Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir> [namePrefixFilter...]

The driver hashes RAW BYTES of the sorted result, so this gate must be
byte-strict, not value-strict:
  * float columns: bitwise uint64 comparison (no -0.0/NaN forgiveness);
  * dtype mismatches FAIL before any value comparison (the round-4 q91
    lesson: DuckDB SUM over BIGINT yields HUGEINT -> pandas float64,
    which the old coercing comparer silently passed while the driver's
    raw-byte hash failed);
  * a schema lint flags HUGEINT/UHUGEINT in the ORACLE OUTPUT schema
    (always an uncast integer aggregate; intermediate CTE hugeints are
    fine and invisible here).
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
prefixes = sys.argv[3:]
con = duckdb.connect()
for tbl in ["region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail, ok = [], []
for name, sql in sorted(oracle.items()):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        fail.append((name, "no spark output"))
        continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        rel = con.sql(sql)
        # Schema lint: HUGEINT in the output schema is always an uncast
        # integer aggregate (SUM over BIGINT etc.) — the driver's raw-byte
        # hash can never match Spark's 8-byte long against int128.
        huge = [c for c, t in zip(rel.columns, rel.types)
                if str(t).upper() in ("HUGEINT", "UHUGEINT", "INT128", "UINT128")]
        if huge:
            fail.append((name, f"oracle output column(s) {huge} are HUGEINT — "
                               f"wrap the aggregate in CAST(... AS BIGINT)"))
            continue
        exp = rel.df()
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
    # Normalize representation-only differences (timestamp unit, bytes->hex);
    # everything else must match dtype-exactly.
    for df in (got, exp):
        for c in df.columns:
            if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], (bytes,)):
                df[c] = df[c].apply(lambda b: b.hex())
            try:
                if str(df[c].dtype).startswith("datetime"):
                    df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
            except Exception:
                pass
    # Dtype-strict gate: any mismatch is a driver hash FAIL regardless of
    # values. For object columns compare the python type of the first
    # non-null element (str vs Decimal vs int all hash differently).
    dt_mism = []
    for c in got.columns:
        da, db = got[c].dtype, exp[c].dtype
        if da != db:
            dt_mism.append((c, str(da), str(db)))
        elif da == object and len(got):
            ta = next((type(v).__name__ for v in got[c] if v is not None), "none")
            tb = next((type(v).__name__ for v in exp[c] if v is not None), "none")
            if ta != tb:
                dt_mism.append((c, f"object[{ta}]", f"object[{tb}]"))
    if dt_mism:
        fail.append((name, f"DTYPE mismatch (spark vs oracle): {dt_mism}"))
        continue
    sort_cols = list(got.columns)
    got = got.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    exp = exp.sort_values(sort_cols, kind="mergesort").reset_index(drop=True)
    mism = []
    for c in got.columns:
        a, b = got[c], exp[c]
        if np.issubdtype(np.asarray(a).dtype, np.floating):
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

# Fold in the batch≡streaming differential verdicts Verify records for
# the structurally-no-oracle backtest queries (q46/q47): diff_match=true
# counts as a pass, false/missing as a fail.
import os
diff_path = f"{out_dir}/differential.json"
if os.path.exists(diff_path):
    for name, row in sorted(json.load(open(diff_path)).items()):
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        if row.get("diff_match") is True:
            ok.append((f"{name} [differential]",
                       row.get("batch_trades", row.get("rank_checks", "?"))))
        else:
            fail.append((f"{name} [differential]", row))

for name, n in ok:
    print(f"PASS {name} ({n} rows)")
for name, why in fail:
    print(f"FAIL {name}: {why}")
print(f"\n{len(ok)} pass / {len(fail)} fail")
sys.exit(1 if fail else 0)
