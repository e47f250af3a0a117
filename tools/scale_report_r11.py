#!/usr/bin/env python3
"""Fold the two scale_bench_r11 detail JSONs into SCALE_r11.md's
tables: per-family time + ratio, and the straggler list (ids whose
sf1/sf0.1 ratio exceeds the flag threshold at 10x rows).

Usage: tools/scale_report_r11.py /tmp/scale_r11_sf01.json /tmp/scale_r11_sf1.json
Prints markdown fragments to stdout (tooling only — driver-side
python, like tools/check.py)."""
import json
import sys
from collections import defaultdict

FLAG = 4.0


def family(qid: str) -> str:
    return qid[0]


def main(p01: str, p1: str) -> None:
    d01 = json.load(open(p01))["queries"]
    d1 = json.load(open(p1))["queries"]
    fams01, fams1 = defaultdict(float), defaultdict(float)
    rows = []
    for qid in sorted(d01):
        t01, t1 = d01[qid], d1.get(qid, -1)
        if t01 <= 0 or t1 <= 0:
            rows.append((qid, t01, t1, None))
            continue
        fams01[family(qid)] += t01
        fams1[family(qid)] += t1
        rows.append((qid, t01, t1, t1 / t01))

    print("| family | ids | sf0.1 (s) | sf1 (s) | ratio |")
    print("|---|---|---|---|---|")
    n_by_fam = defaultdict(int)
    for qid, *_ in rows:
        n_by_fam[family(qid)] += 1
    tot01 = tot1 = 0.0
    for f in sorted(fams01):
        r = fams1[f] / fams01[f]
        tot01 += fams01[f]
        tot1 += fams1[f]
        print(f"| {f} | {n_by_fam[f]} | {fams01[f]:.1f} | {fams1[f]:.1f} "
              f"| {r:.2f}x |")
    print(f"| **total** | {sum(n_by_fam.values())} | **{tot01:.1f}** "
          f"| **{tot1:.1f}** | **{tot1 / tot01:.2f}x** |")
    print()
    print(f"Stragglers (ratio > {FLAG}x at 10x rows):")
    print()
    print("| id | sf0.1 (s) | sf1 (s) | ratio |")
    print("|---|---|---|---|")
    any_flag = False
    for qid, t01, t1, r in rows:
        if r is not None and r > FLAG:
            any_flag = True
            print(f"| {qid} | {t01:.2f} | {t1:.2f} | {r:.2f}x |")
    if not any_flag:
        print("| (none) | | | |")
    errs = [qid for qid, t01, t1, r in rows if r is None]
    if errs:
        print()
        print(f"Failed/missing at one scale: {', '.join(errs)}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
