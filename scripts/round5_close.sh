#!/bin/bash
# Round-5 closing evidence sequence (run after the training blocks):
#   A. stop any trainer, export best checkpoints as release weights
#   B. 12-scene traced probe + analyzers + exact NMS replay
#      (heads/scene vs GT/scene is the leakage signal)
#   C. wide eval: 102 clean + 34 robot-degraded scenes
#   D. bench A/B: default vs SPOT_CROP_SECONDS=1.5 (the fine-sweep byte
#      lever; quality delta checked on the probe in step B2)
#
# Usage: bash scripts/round5_close.sh
set -u
cd "$(dirname "$0")/.."
log=.round5_close.log
echo "=== round5 close $(date -u) ===" | tee -a "$log"

# A. stop trainers (wrapper first so it does not resurrect the child)
for pf in /tmp/sep_train.pid /tmp/train_ft.pid; do
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
  experiments/speech_separation 2>&1 | tee -a "$log"

# B. traced probe + replay
bash scripts/round4_probe.sh .results_r5_probe 2>&1 | tail -60 | tee -a "$log"
python scripts/replay_nms.py .results_r5_probe 2>&1 | tee -a "$log"

# B2. crop quality probe (selection sweeps on the loudest 1.5 s window)
SPOT_CROP_SECONDS=1.5 bash scripts/round4_probe.sh .results_r5_probe_crop \
  2>&1 | tail -25 | tee -a "$log"

# C. wide eval (overwrites .results_speech_r3{,_degraded})
bash scripts/round3_eval_b.sh 2>&1 | tail -30 | tee -a "$log"

# D. bench A/B
echo "--- bench default ---" | tee -a "$log"
python bench.py 2>&1 | tail -3 | tee -a "$log"
echo "--- bench crop 1.5s ---" | tee -a "$log"
SPOT_CROP_SECONDS=1.5 python bench.py 2>&1 | tail -3 | tee -a "$log"

echo "=== close evidence done; analyze, update PERF.md, run tests, commit ===" | tee -a "$log"
