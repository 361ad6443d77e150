#!/usr/bin/env python3
"""End-of-round artifact sanity gate (round-16 lesson: CORRECTNESS_r15
.json closed as `{}` — an empty correctness round is silent unless
something reads the artifacts back).

Usage: python3 tools/roundcheck.py <round-number> [expected-query-count]

Checks, loudly, before the round's final commit:
  1. CORRECTNESS_r{N}.json exists, parses, is non-empty, and its
     per-query rows are all green. A row that is not a dict, or that
     carries NONE of the rows_match/schema_match/hash_match flags,
     FAILS — a driver format change must never read as green
     (round-17 hardening of the round-16 gate).
  2. BENCH_r{N}.json exists, parses, carries a query map of roughly
     the registry size, and discloses its load average. A
     contended_session:true disclosure is surfaced loudly.
  3. BENCH_quiet_r{N}.json (round >= 17): the builder's quiet
     definitive bench as a committed machine-readable artifact — the
     driver artifact has been contended three rounds running, so
     adjudication must not depend on PLANS.md prose. Must parse,
     cover the registry, and be genuinely quiet (no
     contended_session:true, starting loadavg < 4).
Exit 0 only when every check passes; any failure prints REASONS and
exits 1 so a shell `&&` chain halts the close.
"""
import json
import sys

FLAGS = ("rows_match", "schema_match", "hash_match")


def fail(msg: str) -> None:
    print(f"ROUNDCHECK FAIL: {msg}")
    sys.exit(1)


def load(path: str):
    try:
        return json.load(open(path))
    except FileNotFoundError:
        fail(f"{path} missing")
    except json.JSONDecodeError as e:
        fail(f"{path} is not valid JSON: {e}")


def check_correctness(cpath: str, expected) -> None:
    corr = load(cpath)
    if not corr:
        fail(f"{cpath} is EMPTY ({{}}) — the r15 failure mode; rerun "
             "graft.Verify and investigate before closing the round")
    rows = corr.get("queries", corr)
    if not isinstance(rows, dict):
        fail(f"{cpath}: top-level query map is a {type(rows).__name__}, "
             "not a dict — unrecognized artifact format")
    bad, unflagged = [], []
    for k, v in rows.items():
        if not isinstance(v, dict):
            unflagged.append(k)
        elif not any(f in v for f in FLAGS):
            # a row with no recognizable flags must never default to
            # green — that is exactly the silent-close failure mode
            unflagged.append(k)
        elif not all(v.get(f, True) for f in FLAGS if f in v):
            bad.append(k)
    print(f"{cpath}: {len(rows)} rows, {len(bad)} failing, "
          f"{len(unflagged)} unrecognizable")
    if unflagged:
        fail(f"rows carrying none of {FLAGS} (format drift?): "
             f"{','.join(sorted(unflagged)[:20])}")
    if bad:
        fail(f"failing queries: {','.join(sorted(bad)[:20])}")
    if expected and len(rows) < expected * 0.95:
        fail(f"{cpath} has {len(rows)} rows, expected ~{expected} — "
             "a shrunken registry reads as all-green; diff the "
             "declared set")


def contended(bench, raw: str) -> bool:
    if isinstance(bench, dict) and bench.get("contended_session") is True:
        return True
    # driver wrapper embeds the bench line in `tail` — scan it
    return '"contended_session":true' in raw.replace(" ", "")


def check_bench(bpath: str, expected, quiet_required: bool) -> None:
    bench = load(bpath)
    if not bench:
        fail(f"{bpath} is EMPTY")
    raw = json.dumps(bench)
    # two shapes exist: the Bench main's own line ({metric, value,
    # queries, loadavg}) and the driver's wrapper ({n, rc, cpus, tail})
    if "rc" in bench and "queries" not in bench:
        print(f"{bpath}: driver wrapper, rc={bench['rc']} "
              f"cpus={bench.get('cpus')} tail={len(bench.get('tail', ''))}B")
        if bench["rc"] != 0:
            fail(f"{bpath} records bench exit code {bench['rc']}")
        raw = bench.get("tail", "") or raw
        # r17 advice: the wrapper shape skipped the coverage gate, so a
        # truncated registry could close green through it. Parse the
        # embedded bench line out of the tail and apply the SAME >=95%
        # check; an unparseable (truncated) tail falls through to the
        # quiet artifact's gate when one is required, else FAILS.
        # r18 advice: keep only REAL bench lines (metric total_fullnames
        # / total with a parseable queries dict) and prefer the full-name
        # line — a trailing foreign metric line or partial re-print must
        # never be the one the coverage gate judges
        candidates = []
        for line in raw.splitlines():
            i = line.find('{"metric"')
            if i >= 0:
                try:
                    obj = json.loads(line[i:])
                except json.JSONDecodeError:
                    continue
                if obj.get("metric") in ("total_fullnames", "total") \
                        and isinstance(obj.get("queries"), dict):
                    candidates.append(obj)
                # r19 advice: the Bench main now ends stdout with a
                # <200 B "total_compact" line precisely so a size-capped
                # tail always carries a parseable coverage record even
                # when the 8+ KB per-query lines are truncated away
                elif obj.get("metric") == "total_compact" \
                        and isinstance(obj.get("n_queries"), int):
                    candidates.append(obj)
        embedded = next(
            (c for c in candidates if c["metric"] == "total_fullnames"),
            next((c for c in candidates if c["metric"] == "total_compact"),
                 candidates[0] if candidates else None))
        if embedded is not None and embedded.get("metric") == \
                "total_compact":
            n = embedded["n_queries"]
            print(f"{bpath}: embedded compact bench line covers {n} "
                  f"queries ({embedded.get('errors', '?')} errors)")
            if expected and n < expected * 0.95:
                fail(f"{bpath} embedded bench covers {n} queries, "
                     f"expected ~{expected}")
            if embedded.get("errors"):
                fail(f"{bpath} embedded bench reports "
                     f"{embedded['errors']} erroring queries")
        elif embedded is not None and isinstance(
                embedded.get("queries"), dict):
            q = embedded["queries"]
            print(f"{bpath}: embedded bench line covers {len(q)} queries")
            if expected and len(q) < expected * 0.95:
                fail(f"{bpath} embedded bench covers {len(q)} queries, "
                     f"expected ~{expected}")
        elif expected:
            msg = (f"{bpath} wrapper tail has no parseable bench line — "
                   "query coverage unverifiable through this shape")
            if quiet_required:
                print(f"ROUNDCHECK WARN: {msg}; relying on the quiet "
                      "artifact's coverage gate")
            else:
                fail(msg)
    else:
        q = bench.get("queries", {})
        print(f"{bpath}: total={bench.get('value')}{bench.get('unit', '')} "
              f"over {len(q)} queries, loadavg={bench.get('loadavg')}")
        if expected and len(q) < expected * 0.95:
            fail(f"{bpath} covers {len(q)} queries, expected ~{expected}")
        la = bench.get("loadavg")
        if isinstance(la, list) and la and la[0] > 16:
            print(f"ROUNDCHECK WARN: bench ran at loadavg {la[0]} — "
                  "contended artifact (r14/r15 lesson)")
    if contended(bench, raw):
        print(f"ROUNDCHECK WARN: {bpath} discloses contended_session=true "
              "— the artifact's timings are inflated by outside load; "
              "the quiet artifact below is the plan-comparable one"
              if quiet_required else
              f"ROUNDCHECK WARN: {bpath} discloses contended_session=true")


def check_quiet_bench(qpath: str, expected) -> None:
    bench = load(qpath)
    if not bench:
        fail(f"{qpath} is EMPTY")
    q = bench.get("queries", {})
    print(f"{qpath}: total={bench.get('value')}{bench.get('unit', '')} "
          f"over {len(q)} queries, loadavg={bench.get('loadavg')}")
    if expected and len(q) < expected * 0.95:
        fail(f"{qpath} covers {len(q)} queries, expected ~{expected}")
    if bench.get("contended_session") is True:
        fail(f"{qpath} is itself contended — a 'quiet' artifact must be "
             "recorded on an idle box (loadavg < ~2, no parallel suites)")
    la = bench.get("loadavg")
    if isinstance(la, list) and la and la[0] > 4:
        fail(f"{qpath} starting loadavg {la[0]} is not quiet — re-record")


def main() -> None:
    if len(sys.argv) < 2:
        fail("usage: roundcheck.py <round> [expected-count]")
    rnd = int(sys.argv[1])
    expected = int(sys.argv[2]) if len(sys.argv) > 2 else None

    check_correctness(f"CORRECTNESS_r{rnd:02d}.json", expected)
    quiet_required = rnd >= 17
    check_bench(f"BENCH_r{rnd:02d}.json", expected, quiet_required)
    if quiet_required:
        check_quiet_bench(f"BENCH_quiet_r{rnd:02d}.json", expected)
    print("ROUNDCHECK OK")


if __name__ == "__main__":
    main()
