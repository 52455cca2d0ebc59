#!/bin/bash
# Round-4 scaling evidence (BENCH protocol, BASELINE.json north rule):
# the SAME 1.6M-page frontier job at two parallelism levels, load-gated
# (1-min loadavg < 1.5), taskset-pinned, JVM-primed. Two pairs:
#   - 4c vs 16c  (pinned; the r3-comparable pair)
#   - 8c vs 32c  (N and 4N at full box width; 32c necessarily unpinned)
# Efficiency = t(Nc) / (4 × t(4Nc)) per granularity (whole job / big round).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r4_pairs.jsonl}
PAGES=${PAGES:-1600000}
gate() {
  while true; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" 'BEGIN{exit !(l < 1.5)}' && break
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
  echo "{\"pair\": \"$3\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
leg 16 0-15 "4v16"
leg 4  0-3  "4v16"
leg 32 ""   "8v32"
leg 8  0-7  "8v32"
echo done
