#!/usr/bin/env python3
"""Generate SURVEY §8 closing counts from the driver artifacts.

The r9 and r10 verdicts both flagged hand-typed §8 counts that
disagreed with CORRECTNESS_r{N}.json / BENCH_r{N}.json. This script is
the fix: run it at round close and paste its output — the numbers
derive from the same artifacts the judge reads.

Usage: python3 tools/close_counts.py CORRECTNESS_rN.json [BENCH_rN.json]

When the round's driver artifacts don't exist yet (closing before the
driver sweep), point it at a local mirror: run graft.Verify +
tools/check.py --exact and pass --local <sfDir> <verifyOutDir> to
count from the strict local gate instead.
"""
import json, subprocess, sys


def from_driver(cpath, bpath=None):
    d = json.load(open(cpath))
    total = len(d)
    hash_green = rows_only = hash_red = errors = 0
    reds = []
    for name, v in sorted(d.items()):
        if not isinstance(v, dict):
            continue
        err = v.get("err")
        if err == "no_oracle" or v.get("hash_match") is None and not err:
            rows_only += 1
        elif err:
            errors += 1
            reds.append(f"{name} (err: {str(err)[:40]})")
        elif v.get("hash_match"):
            hash_green += 1
        else:
            hash_red += 1
            reds.append(name)
    print(f"queries: {total}")
    print(f"  oracle hash-green: {hash_green}")
    print(f"  rows-only (no_oracle, declared design): {rows_only}")
    print(f"  hash-red: {hash_red}")
    print(f"  errors: {errors}")
    if reds:
        print("  red/error list: " + ", ".join(reds))
    if bpath:
        from_bench(bpath)


def from_bench(bpath):
    """Accepts either Bench's own one-line JSON (bench_full.json) or the
    driver wrapper {n, rc, sf, tail, parsed} — in the latter case the
    totals come from `parsed` when present, else the chunk lines in
    `tail` are reassembled (the r10 stdout-truncation shape)."""
    b = json.load(open(bpath))
    if "tail" in b and "queries" not in b:
        qs = {}
        total = None
        n_failed = "n/a"
        for ln in b.get("tail", "").splitlines():
            ln = ln.strip()
            i = ln.find('{"metric"')
            if i < 0:
                continue
            try:
                obj = json.loads(ln[i:])
            except ValueError:
                continue
            if obj.get("metric") == "chunk":
                qs.update(obj.get("q", {}))
            elif obj.get("metric") == "total":
                total = obj.get("value")
                n_failed = obj.get("n_failed", "n/a")
                qs.update(obj.get("queries", {}))
        if total is None and b.get("parsed"):
            total = b["parsed"].get("value")
        if total is None and qs:
            total = round(sum(qs.values()), 1)
        print(f"bench: total {total} sec over {len(qs)} queries at "
              f"sf={b.get('sf')}, n_failed={n_failed} (from driver tail)")
    else:
        qs = b.get("queries", {})
        total = b.get("value")
        print(f"bench: total {total} {b.get('unit')} over {len(qs)} "
              f"queries at sf={b.get('sf')}, n_failed={b.get('n_failed', 'n/a')}")
    if qs:
        tail = sorted(qs.items(), key=lambda kv: -kv[1])[:5]
        print("  slowest: " + ", ".join(f"{k} {v:.2f}s" for k, v in tail))
        mean = sum(qs.values()) / len(qs)
        print(f"  per-query mean: {mean:.2f}s")


def from_local(sf_dir, out_dir):
    r = subprocess.run(
        [sys.executable, "tools/check.py", "--exact", sf_dir, out_dir],
        capture_output=True, text=True)
    lines = r.stdout.strip().splitlines()
    print(lines[-1] if lines else "(no output)")
    for ln in lines:
        if ln.startswith("FAIL"):
            print(ln)


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--local":
        from_local(args[1], args[2])
    else:
        from_driver(args[0], args[1] if len(args) > 1 else None)
