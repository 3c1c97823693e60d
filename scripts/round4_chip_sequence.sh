#!/bin/bash
# Round-4 chip sequence (run as soon as the axon relay is back):
#   A. the parked round-3 wide eval (102 clean + 34 degraded scenes) on the
#      round-3 weights with the committed NMS defaults  (~75-100 min)
#   B. bench.py on the same weights (default full-T sweeps)  (~30 min)
#   C. bench.py with SPOT_CROP_SECONDS=1.0 — A/B of the cropped-selection
#      lever (PERF.md round-4)  (~20 min, extra compile for the crop shapes)
#   D. hand off to the hard-negative fine-tune (18 remaining epochs,
#      auto-resume; train_until_done.sh restarts across RSS exits)
#
# Each step tolerates failure of the previous (relay flaps): artifacts are
# written per step.  Kill CPU-heavy background jobs (generator/miner) first;
# the single host core contaminates stage timings otherwise.
set -u
cd "$(dirname "$0")/.."

log=.round4_chip.log
echo "=== round4 chip sequence start $(date -u) ===" | tee -a "$log"

echo "--- step A: wide eval (round-3 weights, committed NMS) ---" | tee -a "$log"
bash scripts/round3_eval_b.sh 2>&1 | tee -a "$log"

echo "--- step B: bench (full-T) ---" | tee -a "$log"
python bench.py 2>&1 | tee -a "$log" | tail -5

echo "--- step C: bench (SPOT_CROP_SECONDS=1.0) ---" | tee -a "$log"
SPOT_CROP_SECONDS=1.0 python bench.py 2>&1 | tee -a "$log" | tail -5

echo "--- step D: hard-negative fine-tune (resume to epoch 20) ---" | tee -a "$log"
ACOUSTIC_RSS_EXIT_GB="${ACOUSTIC_RSS_EXIT_GB:-80}" \
    bash scripts/train_until_done.sh experiments/speech_localization \
    2>&1 | tee -a "$log"
