#!/usr/bin/env python3
"""Cross-round bench diff: per-entry median ratios between two
BENCH_full.json-format files (r7 verdict #8 — publish the r7-vs-r6
per-entry ratio table with loadavg context).

Usage: python3 tools/bench_diff.py <old.json> <new.json> [top_n]
Prints: summary (common-entry subtotals, median ratio, loadavg records)
and the top-N biggest regressions/improvements.
"""
import json
import sys


def main(old_path, new_path, top_n=10):
    old = json.load(open(old_path))
    new = json.load(open(new_path))
    om, nm = old["medians"], new["medians"]
    common = sorted(set(om) & set(nm))
    only_old = sorted(set(om) - set(nm))
    only_new = sorted(set(nm) - set(om))
    ratios = {k: (nm[k] / om[k] if om[k] > 0 else float("inf")) for k in common}
    rs = sorted(ratios.values())
    med = rs[(len(rs) - 1) // 2] if rs else float("nan")
    sub_old = sum(om[k] for k in common)
    sub_new = sum(nm[k] for k in common)
    print(f"common entries: {len(common)}  (+{len(only_new)} new, -{len(only_old)} gone)")
    print(f"subtotal: {sub_old:.1f}s -> {sub_new:.1f}s  ({sub_new/sub_old:.3f}x)")
    print(f"median per-entry ratio: {med:.3f}")
    for tag, b in (("old", old), ("new", new)):
        s = b.get("summary", {})
        print(f"{tag} loadavg(before,after)={s.get('loadavg')} "
              f"sf={s.get('sf')} total={s.get('value')}")
    by_r = sorted(ratios.items(), key=lambda kv: -kv[1])
    print(f"\nworst {top_n} (new/old):")
    for k, r in by_r[:top_n]:
        print(f"  {k:32s} {om[k]:7.2f} -> {nm[k]:7.2f}  {r:.2f}x")
    print(f"\nbest {top_n}:")
    for k, r in by_r[-top_n:][::-1]:
        print(f"  {k:32s} {om[k]:7.2f} -> {nm[k]:7.2f}  {r:.2f}x")
    if only_new:
        print("\nnew entries: " + ", ".join(f"{k}={nm[k]:.2f}s" for k in only_new))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
