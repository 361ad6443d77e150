#!/usr/bin/env python3
"""End-of-round artifact sanity gate (round-16 lesson: CORRECTNESS_r15
.json closed as `{}` — an empty correctness round is silent unless
something reads the artifacts back).

Usage: python3 tools/roundcheck.py <round-number> [expected-query-count]

Checks, loudly, before the round's final commit:
  1. CORRECTNESS_r{N}.json exists, parses, is non-empty, and its
     per-query rows are all green (any failing row is printed).
  2. BENCH_r{N}.json exists, parses, carries a query map of roughly
     the registry size, and discloses its load average.
Exit 0 only when every check passes; any failure prints REASONS and
exits 1 so a shell `&&` chain halts the close.
"""
import json
import sys


def fail(msg: str) -> None:
    print(f"ROUNDCHECK FAIL: {msg}")
    sys.exit(1)


def main() -> None:
    if len(sys.argv) < 2:
        fail("usage: roundcheck.py <round> [expected-count]")
    rnd = int(sys.argv[1])
    expected = int(sys.argv[2]) if len(sys.argv) > 2 else None

    cpath = f"CORRECTNESS_r{rnd:02d}.json"
    bpath = f"BENCH_r{rnd:02d}.json"

    try:
        corr = json.load(open(cpath))
    except FileNotFoundError:
        fail(f"{cpath} missing — the driver has not written it yet")
    except json.JSONDecodeError as e:
        fail(f"{cpath} is not valid JSON: {e}")
    if not corr:
        fail(f"{cpath} is EMPTY ({{}}) — the r15 failure mode; rerun "
             "graft.Verify and investigate before closing the round")
    rows = corr.get("queries", corr)
    if isinstance(rows, dict):
        bad = [k for k, v in rows.items()
               if isinstance(v, dict) and not all(
                   v.get(f, True) for f in
                   ("rows_match", "schema_match", "hash_match")
                   if f in v)]
        print(f"{cpath}: {len(rows)} rows, {len(bad)} failing")
        if bad:
            fail(f"failing queries: {','.join(sorted(bad)[:20])}")
        if expected and len(rows) < expected * 0.95:
            fail(f"{cpath} has {len(rows)} rows, expected ~{expected} — "
                 "a shrunken registry reads as all-green; diff the "
                 "declared set")

    try:
        bench = json.load(open(bpath))
    except FileNotFoundError:
        fail(f"{bpath} missing — the driver has not written it yet")
    except json.JSONDecodeError as e:
        fail(f"{bpath} is not valid JSON: {e}")
    if not bench:
        fail(f"{bpath} is EMPTY")
    # two shapes exist: the Bench main's own line ({metric, value,
    # queries, loadavg}) and the driver's wrapper ({n, rc, cpus, tail})
    if "rc" in bench and "queries" not in bench:
        print(f"{bpath}: driver wrapper, rc={bench['rc']} "
              f"cpus={bench.get('cpus')} tail={len(bench.get('tail', ''))}B")
        if bench["rc"] != 0:
            fail(f"{bpath} records bench exit code {bench['rc']}")
        print("ROUNDCHECK OK")
        return
    q = bench.get("queries", {})
    print(f"{bpath}: total={bench.get('value')}{bench.get('unit', '')} "
          f"over {len(q)} queries, loadavg={bench.get('loadavg')}")
    if expected and len(q) < expected * 0.95:
        fail(f"{bpath} covers {len(q)} queries, expected ~{expected}")
    la = bench.get("loadavg")
    if isinstance(la, list) and la and la[0] > 16:
        print(f"ROUNDCHECK WARN: bench ran at loadavg {la[0]} — "
              "contended artifact (r14/r15 lesson); quiet numbers in "
              "PLANS.md are the plan-comparable ones")
    print("ROUNDCHECK OK")


if __name__ == "__main__":
    main()
