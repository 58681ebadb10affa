#!/usr/bin/env python3
"""Round-start testdata drift check.

The round driver can regenerate /root/testdata between rounds with
different parquet physical types (round 6: TIMESTAMP(NANOS) -> naive
timestamp[us], which Spark 4 infers as TIMESTAMP_NTZ and 9 time-based
queries crashed). Run this FIRST each round:

    python3 tools/datacheck.py

It prints each table's timestamp physical types and flags anything
Sources.table does not currently defend against (nanos -> legacy conf;
naive micros -> inferTimestampNTZ=false). Exits non-zero on a flag.
"""
import sys

import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SFS = ["0.001", "0.01", "0.1"]

# physical timestamp layouts Sources.table handles today
KNOWN = {"timestamp[us]", "timestamp[us, tz=UTC]", "timestamp[ns]"}

def main() -> int:
    flagged = []
    for sf in SFS:
        for t in TABLES:
            path = f"/root/testdata/sf{sf}/{t}.parquet"
            try:
                schema = pq.read_schema(path)
            except Exception as e:  # noqa: BLE001 - report and continue
                flagged.append(f"sf{sf}/{t}: unreadable ({e})")
                continue
            for f in schema:
                ts = str(f.type)
                if "timestamp" in ts and ts not in KNOWN:
                    flagged.append(f"sf{sf}/{t}.{f.name}: NEW timestamp layout {ts}")
    meta = pq.ParquetFile("/root/testdata/sf0.01/events.parquet").metadata
    print(f"events sf0.01: rows={meta.num_rows} row_groups={meta.num_row_groups} "
          f"created_by={meta.created_by}")
    # (user_id, ts) uniqueness in events: the BacktestOracle recursion
    # (q46/q47/q111) numbers bars by ROW_NUMBER() OVER (ORDER BY ts) per
    # user, mirroring Backtest.run's sortWithinPartitions(symbol, ts) —
    # BOTH become tie-order-nondeterministic if a regenerated testdata
    # ever repeats a (user, ts). Checked r12 clean at all three SFs;
    # flag loudly if a regen changes that.
    try:
        import duckdb
        for sf in SFS:
            dup = duckdb.sql(
                f"SELECT COUNT(*) FROM (SELECT user_id, ts FROM "
                f"'/root/testdata/sf{sf}/events.parquet' "
                f"GROUP BY 1, 2 HAVING COUNT(*) > 1)").fetchone()[0]
            if dup:
                flagged.append(
                    f"sf{sf}/events: {dup} duplicated (user_id, ts) pairs — "
                    "BacktestOracle/q46 bar order is no longer well-defined; "
                    "add a total tie-break to Backtest.run AND the oracle")
    except ImportError:
        print("duckdb unavailable - (user_id, ts) uniqueness probe skipped")
    if flagged:
        print("DRIFT FLAGS (update Sources.table defenses + SKILL.md):")
        for f in flagged:
            print(" -", f)
        return 1
    print("testdata layouts all match Sources.table's defenses")
    return 0

if __name__ == "__main__":
    sys.exit(main())
