#!/bin/bash
# Interleaved A/B: HEAD vs the r3-verdict build (9417471) on the identical
# 16c / 1.6M-page / 2-round frontier command.
#
# Why: every round-4 scaling leg shows a clean round-0 wall (matching r3's
# clean samples within 10%) but a 2-4x slower big round — systematic, not
# wave-shaped. This decides code-regression vs host-degradation: the two
# legs run back-to-back inside one quiet window (no re-gate between them —
# the inter-leg loadavg residue is self-decay, not contention), so an
# external wave would hit both builds alike.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-BENCH/r4_ab_bisect.jsonl}
PAGES=${PAGES:-1600000}
gate() {
  while true; do
    read -r L1 L5 _ < /proc/loadavg
    awk -v a="$L1" -v b="$L5" 'BEGIN{exit !(a < 1.5 && b < 3.0)}' && break
    sleep 30
  done
}
leg() { # $1 = tag, $2 = repo dir
  PRE=$(cut -d' ' -f1-3 /proc/loadavg)
  J=$(cd "$2" && PYTHONPATH="$2" taskset -c 0-15 python bench/frontier_bench.py \
        --cpus 16 --pages "$PAGES" --rounds 2 --prime 2>/dev/null | tail -1)
  POST=$(cut -d' ' -f1-3 /proc/loadavg)
  echo "{\"build\": \"$1\", \"pre_load\": \"$PRE\", \"post_load\": \"$POST\", \"run\": $J}" >> "$OUT"
}
gate
leg head /root/repo
leg r3-9417471 /tmp/r3build
echo done
