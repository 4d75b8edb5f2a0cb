#!/usr/bin/env python3
"""Adjudicate two bench boards under the same-boot rule (VERDICT r12 #7c).

Usage: python3 scripts/board_diff.py OLD.json NEW.json

Boards drift ~15-20% uniformly across a reboot (CLAUDE.md), so a raw
per-query comparison across boots is noise. This helper:
 - reports whether the boards share a boot_id (machine-checkable since
   round 13) and their loadavg_start stamps;
 - computes the MEDIAN same-query ratio as the boot/load band;
 - flags only queries whose ratio exceeds the band by >1.3x (or new
   unstable entries) as candidate regressions.
"""
import json
import statistics
import sys


def load(path):
    d = json.load(open(path))
    # driver BENCH_rNN.json wraps the board under "parsed" (possibly null,
    # with the compact line recoverable from the stdout "tail")
    if "queries" not in d:
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        elif "tail" in d:
            line = [l for l in d["tail"].splitlines() if '{"metric"' in l]
            if line:
                d = json.loads(line[-1][line[-1].index('{"metric"'):])
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' map found")
    return d


def main(old_path, new_path):
    old = load(old_path)
    new = load(new_path)
    same_boot = old.get("boot_id") and old.get("boot_id") == new.get("boot_id")
    print(f"boot: old={old.get('boot_id', '?')[:8]} new={new.get('boot_id', '?')[:8]} "
          f"{'SAME' if same_boot else 'DIFFERENT (expect a uniform 15-20% band)'}")
    print(f"loadavg_start: old={old.get('loadavg_start')} new={new.get('loadavg_start')}")
    for b, name in ((old, "old"), (new, "new")):
        # the 1-min figure alone can be the launcher's own startup spike;
        # foreign load shows in the 5-min average too (when stamped)
        l1 = float(b.get("loadavg_start", 0))
        l5 = float(b.get("loadavg_start5", l1))
        if l1 > 2.0 and l5 > 2.0:
            print(f"!! {name} board is CONTAMINATED (loadavg_start {l1}/{l5}) — "
                  "numbers not comparable")
    shared = sorted(set(old["queries"]) & set(new["queries"]))
    ratios = {q: new["queries"][q] / old["queries"][q]
              for q in shared if old["queries"][q] > 0.05}
    if not ratios:
        print("no shared queries above the 50ms noise floor")
        return
    band = statistics.median(ratios.values())
    print(f"shared queries: {len(shared)}; median ratio (the band): {band:.3f}")
    unstable = set(old.get("unstable", [])) | set(new.get("unstable", []))
    flagged = []
    for q, r in sorted(ratios.items(), key=lambda kv: -kv[1]):
        if r > band * 1.3 and new["queries"][q] - old["queries"][q] * band > 0.2:
            mark = " (UNSTABLE)" if q in unstable else ""
            flagged.append(q)
            print(f"  REGRESSION? {q}: {old['queries'][q]:.2f}s -> "
                  f"{new['queries'][q]:.2f}s (ratio {r:.2f} vs band {band:.2f}){mark}")
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_new:
        tot = sum(new["queries"][q] for q in only_new)
        slowest = sorted(only_new, key=lambda q: -new["queries"][q])[:12]
        print(f"queries only in new ({len(only_new)}, {tot:.1f}s total; "
              f"slowest: {', '.join(slowest)})")
    if not flagged:
        print("no band-adjusted regressions")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
