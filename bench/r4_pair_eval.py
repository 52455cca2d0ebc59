#!/usr/bin/env python
"""Summarize scaling pairs in BENCH/r4_pairs.jsonl.

For each (pair tag, cpus) level prints every sample's whole-job and
big-round walls, then computes efficiency from the MIN wall per level:
external contention on this shared host only ever inflates a wall, so the
minimum over samples is the closest observable to the uncontended time
(same convention as the r3 'best clean sample per level' table).

Efficiency(N -> 4N) = t(Nc) / (4 * t(4Nc)).
"""
import json
import sys
from collections import defaultdict

path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/r4_pairs.jsonl"
rows = [json.loads(l) for l in open(path) if l.strip()]

by_level = defaultdict(list)  # (base_pair, cpus) -> [row]
for r in rows:
    base = r["pair"].split("-")[0]  # 4v16-rerun -> 4v16
    by_level[(base, r["run"]["cpus"])].append(r)

for (base, cpus), samples in sorted(by_level.items()):
    print(f"== {base} @ {cpus}c ({len(samples)} samples)")
    for s in samples:
        run = s["run"]
        big = run["round_wall_s"][-1]
        print(
            f"   whole {run['wall_s']:8.1f}s  big {big:8.1f}s  "
            f"rounds {run['round_wall_s']}  pre {s['pre_load']}  post {s['post_load']}"
        )

for base, (lo, hi) in {"4v16": (4, 16), "8v32": (8, 32)}.items():
    lo_s = by_level.get((base, lo))
    hi_s = by_level.get((base, hi))
    if not lo_s or not hi_s:
        continue
    t_lo_w = min(s["run"]["wall_s"] for s in lo_s)
    t_hi_w = min(s["run"]["wall_s"] for s in hi_s)
    t_lo_b = min(s["run"]["round_wall_s"][-1] for s in lo_s)
    t_hi_b = min(s["run"]["round_wall_s"][-1] for s in hi_s)
    print(
        f"{base}: whole-job eff {t_lo_w / (4 * t_hi_w):.2f} "
        f"({t_lo_w:.1f}s -> {t_hi_w:.1f}s), "
        f"big-round eff {t_lo_b / (4 * t_hi_b):.2f} "
        f"({t_lo_b:.1f}s -> {t_hi_b:.1f}s)"
    )
