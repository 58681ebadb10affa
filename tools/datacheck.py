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
    if flagged:
        print("DRIFT FLAGS (update Sources.table defenses + SKILL.md):")
        for f in flagged:
            print(" -", f)
        return 1
    print("testdata layouts all match Sources.table's defenses")
    return 0

if __name__ == "__main__":
    sys.exit(main())
