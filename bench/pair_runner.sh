#!/bin/bash
# Load-gated scaling pairs (BENCH protocol): wait for a quiet window
# (1-min loadavg < 1.5), run the 16-core leg, wait again, run the 4-core
# leg, append both JSON lines (with the loadavg bracketing each leg) to
# BENCH/r3_pairs.jsonl. Repeat $1 times (default 3).
set -u
cd "$(dirname "$0")/.."
N=${1:-3}
OUT=BENCH/r3_pairs.jsonl
gate() {
  while true; do
    L=$(cut -d' ' -f1 /proc/loadavg)
    awk -v l="$L" 'BEGIN{exit !(l < 1.5)}' && break
    sleep 30
  done
}
leg() { # $1 = cpus, $2 = cpu list
  gate
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  J=$(taskset -c "$2" python bench/frontier_bench.py --cpus "$1" \
        --pages 400000 --filler-paragraphs 60 --prime 2>/dev/null | tail -1)
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"pair\": $i, \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
for i in $(seq 1 "$N"); do
  leg 16 0-15
  leg 4 0-3
done
echo done
