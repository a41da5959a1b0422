#!/usr/bin/env python3
"""Round-over-round per-query bench comparison.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--md]

Both inputs are `graft.Bench` output maps (the {"metric":...,"queries":
{...}} line, e.g. `git show <round-commit>:bench_queries.json` vs the
working-tree file). Prints the matched totals, the median per-query
ratio (the host-drift indicator: ~1.0 means same box conditions, a
uniform shift means load, not code), and the largest movers both ways.
With --md, emits a markdown table suitable for BENCHVS.md.

Dev tool only — the shipped Scala library has no Python dependency.
"""
import sys, json


def load(path):
    with open(path) as f:
        txt = f.read()
    # tolerate a log file containing the one JSON line
    for line in txt.splitlines():
        line = line.strip()
        if line.startswith('{"metric"'):
            return json.loads(line)
    return json.loads(txt)


def main():
    args = [a for a in sys.argv[1:] if a != "--md"]
    md = "--md" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    ratios = sorted((nq[k] / oq[k], k) for k in common if oq[k] > 0)
    med = ratios[len(ratios) // 2][0]
    tot_o = sum(oq[k] for k in common)
    tot_n = sum(nq[k] for k in common)
    print(f"matched {len(common)} queries; old total {tot_o:.1f} s, "
          f"new total {tot_n:.1f} s ({tot_n / tot_o:.2f}x)")
    print(f"median per-query ratio new/old: {med:.2f}")
    if only_old:
        print(f"dropped ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        print(f"added ({len(only_new)}): "
              + ", ".join(f"{k} {nq[k]:.2f}s" for k in only_new))
    movers = [r for r in ratios if r[0] >= 1.5 or r[0] <= 1 / 1.5]
    slow = [r for r in reversed(ratios) if r[0] >= 1.5][:12]
    fast = [r for r in ratios if r[0] <= 1 / 1.5][:12]
    if md:
        print("\n| query | old s | new s | ratio |")
        print("|---|---|---|---|")
        for r, k in slow + list(reversed(fast)):
            print(f"| {k} | {oq[k]:.2f} | {nq[k]:.2f} | {r:.2f}x |")
    else:
        if slow:
            print("\nslower >=1.5x:")
            for r, k in slow:
                print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f} s ({r:.2f}x)")
        if fast:
            print("faster >=1.5x:")
            for r, k in fast:
                print(f"  {k}: {oq[k]:.2f} -> {nq[k]:.2f} s ({r:.2f}x)")
    if not movers:
        print("no per-query movement beyond 1.5x either way")


if __name__ == "__main__":
    main()
