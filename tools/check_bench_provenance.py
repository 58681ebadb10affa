#!/usr/bin/env python3
"""Assert bench_full.json IS the run bench_provenance.json declares
committed (r16 — the r15 round-close committed a turbulent late run
over the triple the provenance described; the two artifacts must name
the same numbers or regression tracking is anchored to fiction).

Usage: python3 tools/check_bench_provenance.py   (from the repo root)
Exits non-zero with a diff message on mismatch; prints one OK line on
success. Run by gate.sh and by hand after committing a bench triple.
"""
import json
import re
import sys

TOL_S = 0.011  # artifacts round to milliseconds


def fail(msg: str) -> None:
    print(f"BENCH-PROVENANCE MISMATCH: {msg}", file=sys.stderr)
    sys.exit(1)


def main() -> None:
    full = json.load(open("bench_full.json"))
    prov = json.load(open("bench_provenance.json"))

    def is_committed(r):
        # dedicated boolean field preferred; the label fallback is a
        # WORD match so 'uncommitted'/'not committed' can never select
        if "committed" in r:
            return bool(r["committed"])
        label = r.get("label", "")
        return (re.search(r"(?<![a-z])committed", label) is not None
                and "not committed" not in label)

    committed = [r for r in prov.get("runs", []) if is_committed(r)]
    if len(committed) != 1:
        fail(f"provenance must mark exactly one run committed "
             f"(boolean field or label word), found {len(committed)}")
    run = committed[0]
    pairs = [
        ("value", "cold_total_s"),
        ("value_warmed", "warm_total_s"),
    ]
    for full_key, run_key in pairs:
        a, b = full.get(full_key), run.get(run_key)
        if a is None or b is None:
            fail(f"missing {full_key} / {run_key} "
                 f"(bench_full has {a}, provenance run has {b})")
        if abs(a - b) > TOL_S:
            fail(f"bench_full.{full_key}={a} but the committed run's "
                 f"{run_key}={b} — the committed artifact is not the "
                 f"run its provenance describes")
    nq = prov.get("n_queries")
    if nq is not None and nq != len(full.get("queries", {})):
        fail(f"provenance n_queries={nq} but bench_full carries "
             f"{len(full['queries'])} queries")
    print(f"bench_full.json matches its provenance: cold {full['value']:.3f} "
          f"warm {full['value_warmed']:.3f} over {len(full['queries'])} queries")


if __name__ == "__main__":
    main()
