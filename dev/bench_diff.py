#!/usr/bin/env python3
"""Diff two graft bench outputs (BENCH_r{N}.json, BENCH_DETAILS.json, or a
log containing the one-line {"metric": ...} JSON). Separates real
regressions from machine noise: a UNIFORM inflation across all heavy
entries is context (JIT, a co-tenant process), a localized jump is a plan
change worth chasing.

By default diffs the WARM per-entry map when both inputs carry one
covering their entries (the cold map's round-position Janino/JIT noise
produced three rounds of phantom regressions — PLANS.md §18); falls back
to cold, and `--cold` forces it. Warm sentinel -1.0 (re-run failed) is
excluded from ratios. When both inputs carry a `shuffle` byte map, entries
whose shuffle read+write bytes moved >1.5x are reported too — bytes moved
is the scale signal wall-clock noise can't fake.

Usage: python3 dev/bench_diff.py OLD NEW [--threshold 1.5] [--cold]
"""
import json, statistics, sys


def load(path):
    with open(path) as f:
        txt = f.read()
    try:
        j = json.loads(txt)
        if "queries" in j:
            return j
        # driver wrapper (BENCH_r{N}.json): the bench line under "parsed",
        # or raw in the captured "tail"
        if isinstance(j.get("parsed"), dict) and "queries" in j["parsed"]:
            return j["parsed"]
        txt = j.get("tail", txt)
    except (json.JSONDecodeError, AttributeError):
        pass
    for line in txt.splitlines():
        if '"metric"' in line:
            return json.loads(line[line.index('{'):])
    raise SystemExit(f"no bench JSON found in {path}")


def pick(old, new, force_cold):
    """Prefer warm-to-warm when both sides have a warm map covering
    (most of) their entries; else cold."""
    ow, nw = old.get("warm") or {}, new.get("warm") or {}
    oq, nq = old["queries"], new["queries"]
    if (not force_cold and len(ow) >= 0.9 * len(oq)
            and len(nw) >= 0.9 * len(nq)):
        return ({k: v for k, v in ow.items() if v >= 0},
                {k: v for k, v in nw.items() if v >= 0}, "warm")
    return ({k: v for k, v in oq.items() if v >= 0},
            {k: v for k, v in nq.items() if v >= 0}, "cold")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 1.5
    force_cold = "--cold" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thr = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    oldj, newj = load(args[0]), load(args[1])
    old, new, mode = pick(oldj, newj, force_cold)
    shared = sorted(set(old) & set(new))
    heavy = [k for k in shared if old[k] > 0.5]
    ratios = {k: new[k] / old[k] for k in heavy}
    med = statistics.median(ratios.values()) if ratios else 1.0
    print(f"mode: {mode}-to-{mode}")
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
    # shuffle-bytes diff: deterministic, noise-free plan-change signal
    osh, nsh = oldj.get("shuffle") or {}, newj.get("shuffle") or {}
    if osh and nsh:
        print("\nshuffle-bytes changes (read+write moved >1.5x, >1 MiB):")
        hits = False
        for k in sorted(set(osh) & set(nsh)):
            ob = osh[k].get("read", 0) + osh[k].get("write", 0)
            nb = nsh[k].get("read", 0) + nsh[k].get("write", 0)
            if max(ob, nb) > 1 << 20 and (
                    ob == 0 or nb == 0 or nb / ob > 1.5 or ob / nb > 1.5):
                print(f"  {k}: {ob/1e6:.1f} MB -> {nb/1e6:.1f} MB")
                hits = True
        if not hits:
            print("  none")
    gone = sorted(set(old) - set(new))
    added = sorted(set(new) - set(old))
    if added:
        print(f"\nnew entries: {', '.join(f'{k} ({new[k]:.2f}s)' for k in added)}")
    if gone:
        print(f"removed entries: {', '.join(gone)}")


if __name__ == "__main__":
    try:
        main()
    except BrokenPipeError:  # `| head` closed the pipe — not an error
        pass
