#!/bin/bash
# Whole-job fixed-cost probe (VERDICT r3 item 1's alternative deliverable:
# "a profile attributing the remainder to named fixed costs").
#
# Model: wall(N cores) = F + W/N, where F is the per-job serial cost
# (driver planning, task scheduling, JVM barriers, the per-round pin/bloom
# job launches) and W the parallelizable work. The 4c/16c pair gives two
# equations; this probe independently MEASURES F by running the same
# 2-round frontier job on a corpus ~100x smaller (16k pages), where
# W/N is a few seconds and the wall is dominated by the same per-round
# job launches the big run pays. If probe walls at 4c and 16c agree with
# the F solved from the big pair, the whole-job-vs-big-round efficiency
# gap is accounted for by fixed cost, not by a scaling defect in the work.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r4_fixed_cost.jsonl}
gate() {
  while true; do
    read -r L1 L5 _ < /proc/loadavg
    awk -v a="$L1" -v b="$L5" 'BEGIN{exit !(a < 1.5 && b < 3.0)}' && break
    sleep 30
  done
}
leg() { # $1 = cpus, $2 = cpu list
  gate
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  J=$(taskset -c "$2" python bench/frontier_bench.py --cpus "$1" \
        --pages 16000 --rounds 2 --prime 2>/dev/null | tail -1)
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"probe\": \"fixed_cost_16k\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
leg 16 0-15
leg 4  0-3
echo done
