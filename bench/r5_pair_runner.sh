#!/bin/bash
# Round-5 scaling evidence (BENCH protocol, BASELINE.json north rule):
# the SAME 1.6M-page frontier job at 4 and 16 pinned cores, load-gated
# (1-min loadavg < 1.5), JVM-primed — directly comparable to
# BENCH/r4_late_pair.jsonl (same pages/rounds/gate). Measures the effect
# of the shuffle-free sparse big-round position assignment.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r5_pair.jsonl}
PAGES=${PAGES:-1600000}
gate() {
  while true; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" 'BEGIN{exit !(l < 1.5)}' && break
    sleep 30
  done
}
leg() { # $1 = cpus, $2 = cpu list, $3 = tag
  gate
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  J=$(taskset -c "$2" python bench/frontier_bench.py --cpus "$1" \
        --pages "$PAGES" --rounds 2 --prime 2>/dev/null | tail -1)
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"pair\": \"$3\", \"gate\": \"strict\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
leg 16 0-15 "r5-4v16"
leg 4  0-3  "r5-4v16"
echo done
