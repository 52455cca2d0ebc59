#!/bin/bash
# Round-4 SECOND campaign: same strict-gated protocol as r4_pair_rerun.sh
# (1-min < 1.5 AND 5-min < 3.0, taskset-pinned, --prime, reused 64-bucket
# 1.6M-page table), run against the shuffle-lean frontier:
#   - seen-filter BEFORE the first-wins dedup window (one full-candidate
#     shuffle removed per round),
#   - arithmetic chunk ids instead of repartitionByRange in the big-round
#     positions path (sampling pass + one full-row exchange removed),
#   - (depth, discovery_pos) carried through the Arrow parse instead of the
#     join-back to fetched_keys (one candidate-sized shuffle join removed).
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r4_bucketed_pairs_v2.jsonl}
PAGES=${PAGES:-1600000}
gate() {
  while true; do
    read -r L1 L5 _ < /proc/loadavg
    awk -v a="$L1" -v b="$L5" 'BEGIN{exit !(a < 1.5 && b < 3.0)}' && break
    sleep 30
  done
}
leg() { # $1 = cpus, $2 = cpu list ("" = unpinned), $3 = tag
  gate
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  if [ -n "$2" ]; then
    J=$(taskset -c "$2" python bench/frontier_bench.py --cpus "$1" \
          --pages "$PAGES" --rounds 2 --bucketed-pages 64 \
          --reuse-bucketed-table --prime 2>/dev/null | tail -1)
  else
    J=$(python bench/frontier_bench.py --cpus "$1" \
          --pages "$PAGES" --rounds 2 --bucketed-pages 64 \
          --reuse-bucketed-table --prime 2>/dev/null | tail -1)
  fi
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"campaign\": \"$3\", \"gate\": \"strict\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
leg 4  0-3  "v2"
leg 16 0-15 "v2"
leg 8  0-7  "v2"
leg 32 ""   "v2"
echo done
