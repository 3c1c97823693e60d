#!/bin/bash
# Compressed round-4 chip sequence for a late relay return (~2h of evidence):
#   A. 34-scene clean + 34-scene degraded eval (shard 0 of 9) — directly
#      comparable to the round-3 traced mini-eval and round-2's 39 scenes
#   B. bench.py (full-T) and bench.py with SPOT_CROP_SECONDS=1.0 (A/B)
#   C. hand off to the hard-negative fine-tune for whatever time remains
set -u
cd "$(dirname "$0")/.."
log=.round4_chip.log
echo "=== round4 SHORT chip sequence start $(date -u) ===" | tee -a "$log"

rm -rf .results_speech_r4s .results_speech_r4s_degraded
python -m acousticswarms_speech_tpu.pipeline.evaluate .speechdata_v1/test \
  --spot_experiment_dir experiments/speech_localization \
  --sep_experiment_dir experiments/speech_separation \
  --results_folder .results_speech_r4s \
  --use_fp16 --cached_init --num_shards 9 --shard_indices 0 \
  --degrade_shard_indices 0 2>&1 | tee -a "$log" | tail -3
echo "=== analyze clean ===" | tee -a "$log"
python -m acousticswarms_speech_tpu.pipeline.analyze .results_speech_r4s 2>&1 | tee -a "$log"
echo "=== analyze degraded ===" | tee -a "$log"
python -m acousticswarms_speech_tpu.pipeline.analyze .results_speech_r4s_degraded 2>&1 | tee -a "$log"

echo "--- bench (full-T) ---" | tee -a "$log"
python bench.py 2>&1 | tee -a "$log" | tail -4
echo "--- bench (crop 1.0s) ---" | tee -a "$log"
SPOT_CROP_SECONDS=1.0 python bench.py 2>&1 | tee -a "$log" | tail -4

echo "--- fine-tune handoff ---" | tee -a "$log"
ACOUSTIC_RSS_EXIT_GB="${ACOUSTIC_RSS_EXIT_GB:-80}" \
    bash scripts/train_until_done.sh experiments/speech_localization \
    2>&1 | tee -a "$log"
