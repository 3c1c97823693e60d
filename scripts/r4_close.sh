#!/bin/bash
# Round close evidence sequence.  Run with ~2h of round left:
#   A. stop trainer + miner, export the fine-tune best as release weights
#   B. traced 12-scene probe + analyzers + NMS replay (now incl. TDoA-dev
#      labeled distributions and the offline gate sweep)
#   C. wide eval: 102 clean + 34 robot-degraded scenes
#   D. bench ladder: default / crop 1.5 s / crop 1.5 s + chunk 256
#      (gate variants added manually if the replay validates the gate)
#
# Usage: bash scripts/r4_close.sh [probe_dir=.results_r4b_probe]
set -u
cd "$(dirname "$0")/.."
out="${1:-.results_r4b_probe}"
log=.r4_close.log
echo "=== r4 close $(date -u) ===" | tee -a "$log"

# A. stop trainer wrapper first (so it cannot resurrect the child), then
# the child; then the miner/recovery chain.
for pf in /tmp/train_ft.pid /tmp/sep_train.pid /tmp/chain.pid; do
  if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
    kill "$(cat "$pf")" 2>/dev/null || true
  fi
done
if [ -f /tmp/train_child.pid ] && kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_child.pid)"
  for i in $(seq 1 30); do
    kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null || break
    sleep 3
  done
  kill -9 "$(cat /tmp/train_child.pid)" 2>/dev/null || true
  echo "trainer stopped" | tee -a "$log"
fi
sleep 5

python scripts/export_release.py experiments/speech_localization \
  2>&1 | tee -a "$log"

# B. traced probe + analyzers + replay
bash scripts/round4_probe.sh "$out" 2>&1 | tail -60 | tee -a "$log"
echo "--- replay: merge-threshold sweep ---" | tee -a "$log"
python scripts/replay_nms.py "$out" 2>&1 | tee -a "$log"
echo "--- replay: TDoA-dev labeled distributions ---" | tee -a "$log"
python scripts/replay_nms.py "$out" --devs 2>&1 | tee -a "$log"
echo "--- replay: TDoA gate sweep ---" | tee -a "$log"
python scripts/replay_nms.py "$out" --gate 5 8 12 24 48 2>&1 | tee -a "$log"

# C. wide eval (overwrites .results_speech_r3{,_degraded})
bash scripts/round3_eval_b.sh 2>&1 | tail -30 | tee -a "$log"

# D. bench ladder
echo "--- bench default ---" | tee -a "$log"
python bench.py 2>&1 | tail -3 | tee -a "$log"
echo "--- bench crop 1.5s ---" | tee -a "$log"
SPOT_CROP_SECONDS=1.5 python bench.py 2>&1 | tail -3 | tee -a "$log"
echo "--- bench crop 1.5s + chunk 256 ---" | tee -a "$log"
SPOT_CROP_SECONDS=1.5 SPOT_MAP_CHUNK=256 python bench.py 2>&1 | tail -3 | tee -a "$log"

echo "=== close evidence done; analyze, update PERF.md, run tests, commit ===" | tee -a "$log"
