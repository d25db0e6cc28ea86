#!/usr/bin/env python3
"""Diff two graft bench outputs (BENCH_r{N}.json or a log containing the
one-line {"metric": ...} JSON). Separates real regressions from machine
noise: a UNIFORM inflation across all heavy entries is context (JIT, a
co-tenant process), a localized jump is a plan change worth chasing.

Usage: python3 dev/bench_diff.py OLD NEW [--threshold 1.5]
"""
import json, statistics, sys


def load(path):
    with open(path) as f:
        txt = f.read()
    for line in txt.splitlines():
        if '"metric"' in line:
            return json.loads(line[line.index('{'):])["queries"]
    j = json.loads(txt)
    if "queries" in j:
        return j["queries"]
    raise SystemExit(f"no bench JSON found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    shared = sorted(set(old) & set(new))
    heavy = [k for k in shared if old[k] > 0.5]
    ratios = {k: new[k] / old[k] for k in heavy}
    med = statistics.median(ratios.values()) if ratios else 1.0
    print(f"entries: old {len(old)}, new {len(new)}, shared {len(shared)}")
    print(f"totals:  old {sum(old.values()):.1f}s, new {sum(new.values()):.1f}s")
    print(f"median inflation on >0.5s entries: {med:.2f}x "
          f"({'machine-context noise level' if med > 1.15 else 'comparable runs'})")
    print(f"\nnoise-adjusted regressions (ratio > {thr}x the median):")
    found = False
    for k in sorted(heavy, key=lambda k: -(new[k] - old[k])):
        if ratios[k] > thr * med and new[k] > 1.0:
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({ratios[k]:.1f}x)")
            found = True
    if not found:
        print("  none")
    print("\nnoise-adjusted wins (ratio < median / {:.1f}):".format(thr))
    for k in sorted(heavy, key=lambda k: -(old[k] - new[k])):
        if ratios[k] < med / thr and old[k] > 1.0:
            print(f"  {k}: {old[k]:.2f}s -> {new[k]:.2f}s")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if added:
        print(f"\nnew entries: {', '.join(f'{k} ({new[k]:.2f}s)' for k in added)}")
    if gone:
        print(f"removed entries: {', '.join(gone)}")


if __name__ == "__main__":
    main()
