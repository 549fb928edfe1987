#!/usr/bin/env python3
"""Equal-count min-of-N sweep comparison between two rounds' local bench
sweeps: per query, take the min across each round's sweep files, sum over
the common query set, and list the biggest movers. Usage:

  python3 tools/bench_compare.py 'BENCH_r16.local.*.json' 'BENCH_r17.local.*.json'
"""
import glob
import json
import sys


def sweep_key(path):
    """Numeric sweep suffix (…local.<n>.json) so 10 sorts after 2 —
    lexicographic order would make the 'first n' subset arbitrary."""
    parts = path.rsplit(".", 2)
    try:
        return (int(parts[-2]), path)
    except (ValueError, IndexError):
        return (0, path)


def mins(pattern, n=None):
    out = {}
    files = sorted(glob.glob(pattern), key=sweep_key)[:n]
    for f in files:
        q = json.load(open(f))["queries"]
        for k, v in q.items():
            out[k] = min(out.get(k, float("inf")), v)
    return out


def main():
    n = min(len(glob.glob(sys.argv[1])), len(glob.glob(sys.argv[2])))
    a = mins(sys.argv[1], n)
    b = mins(sys.argv[2], n)
    common = sorted(set(a) & set(b))
    sa = sum(a[k] for k in common)
    sb = sum(b[k] for k in common)
    print(f"common queries: {len(common)}  sweeps used: {n}")
    ratio = f"{sb / sa:.3f}x" if sa > 0 else "n/a (empty common set)"
    print(f"old: {sa:.1f} s   new: {sb:.1f} s   ratio: {ratio}")
    movers = sorted(((b[k] - a[k], k) for k in common), reverse=True)
    print("biggest regressions:")
    for d, k in movers[:10]:
        if d <= 0:
            break
        print(f"  {k:45s} {a[k]:7.2f} -> {b[k]:7.2f}  ({d:+.2f}, {b[k] / max(a[k], 1e-9):.2f}x)")
    print("biggest improvements:")
    for d, k in sorted(movers)[:10]:
        if d >= 0:
            break
        print(f"  {k:45s} {a[k]:7.2f} -> {b[k]:7.2f}  ({d:+.2f})")
    new = sorted(set(b) - set(a))
    if new:
        print("new-only queries:", {k: round(b[k], 2) for k in new})


if __name__ == "__main__":
    main()
