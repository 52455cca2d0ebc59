#!/bin/bash
# Round-4 scaling-pair rerun with a STRICTER load gate.
#
# Why: every leg of the first r4 campaign (BENCH/r4_pairs.jsonl lines 1-4)
# ran inside an external load wave — the 16c leg's 320k-page round took
# 147 s vs the 4c leg's 110 s on identical work, and the 32c leg came out
# SLOWER than the 8c leg (609 s vs 372 s), both physically impossible
# without outside contention (same failure mode as the r3 pair-2
# disclosure: 1-min momentarily quiet, 5/15-min still elevated).
# This rerun gates on 1-min < 1.5 AND 5-min < 3.0 so a leg cannot start
# inside a wave's trough, and reruns BOTH pairs (4v16 pinned, 8v32).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r4_pairs.jsonl}
PAGES=${PAGES:-1600000}
gate() {
  while true; do
    read -r L1 L5 _ < /proc/loadavg
    awk -v a="$L1" -v b="$L5" 'BEGIN{exit !(a < 1.5 && b < 3.0)}' && break
    sleep 30
  done
}
leg() { # $1 = cpus, $2 = cpu list ("" = unpinned), $3 = pair tag
  gate
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  if [ -n "$2" ]; then
    J=$(taskset -c "$2" python bench/frontier_bench.py --cpus "$1" \
          --pages "$PAGES" --rounds 2 --prime 2>/dev/null | tail -1)
  else
    J=$(python bench/frontier_bench.py --cpus "$1" \
          --pages "$PAGES" --rounds 2 --prime 2>/dev/null | tail -1)
  fi
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"pair\": \"$3\", \"gate\": \"strict\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
leg 16 0-15 "4v16-rerun"
leg 4  0-3  "4v16-rerun"
leg 32 ""   "8v32-rerun"
leg 8  0-7  "8v32-rerun"
echo done
