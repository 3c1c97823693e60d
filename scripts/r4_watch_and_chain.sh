#!/bin/bash
# Chains this round's phases without manual babysitting:
#   1. wait until round5_open.sh's bench is DONE (log reaches the traced-
#      probe step) — no host contention while bench.py times the chip
#   2. mine the fine-tune val set during the probe window (nice 19)
#   3. wait for the evidence runbook and the corpus generator to exit
#   4. launch scripts/r4_recover_train.sh (sep epochs while train mining
#      ramps, then auto-switch to the localization fine-tune)
#
# Usage: nohup bash scripts/r4_watch_and_chain.sh > .r4_chain.log 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[chain] waiting for bench to finish $(date -u)"
while ! grep -q -- "--- traced probe" .round5_open.log 2>/dev/null; do
  sleep 60
done

echo "[chain] bench done; mining val $(date -u)"
nice -n 19 python scripts/mine_range.py .speechdata_v1/val 0 150 2>&1 | tail -1

echo "[chain] waiting for the evidence runbook + generator $(date -u)"
while [ -f /tmp/r5open.pid ] && kill -0 "$(cat /tmp/r5open.pid)" 2>/dev/null; do
  sleep 60
done
while [ -f /tmp/gen_train.pid ] && kill -0 "$(cat /tmp/gen_train.pid)" 2>/dev/null; do
  sleep 60
done

echo "[chain] launching training recovery $(date -u)"
MIN_FT_SCENES=600 bash scripts/r4_recover_train.sh > .r4_recover.log 2>&1
echo "[chain] recovery script exited $(date -u)"
