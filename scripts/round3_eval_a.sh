#!/bin/bash
# Round-3 finish, step A: stop the separation trainer at its last completed
# checkpoint, export release weights for all three speech experiments, then
# run the traced mini-eval (1/9th of the test split, loose coarse threshold,
# ACOUSTIC_TRACE_POWERS=1) whose trace_*.json feed scripts/tune_thresholds.py.
set -e
cd "$(dirname "$0")/.."

if [ -f /tmp/train_sep.pid ] && kill -0 "$(cat /tmp/train_sep.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_sep.pid)" 2>/dev/null || true
fi
if [ -f /tmp/train_child.pid ] && kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_child.pid)"
  for i in $(seq 1 20); do
    kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null || break
    sleep 3
  done
  kill -9 "$(cat /tmp/train_child.pid)" 2>/dev/null || true
  echo "separation trainer stopped"
fi

python scripts/export_release.py \
  experiments/speech_localization_stage1 \
  experiments/speech_localization \
  experiments/speech_separation

rm -rf .results_speech_r3_trace
SPOT_POWER_THRESHOLD1=0.004 ACOUSTIC_TRACE_POWERS=1 \
python -m acousticswarms_speech_tpu.pipeline.evaluate .speechdata_v1/test \
  --spot_experiment_dir experiments/speech_localization \
  --sep_experiment_dir experiments/speech_separation \
  --results_folder .results_speech_r3_trace \
  --use_fp16 --cached_init --num_shards 9 --shard_index 0
python scripts/tune_thresholds.py .results_speech_r3_trace
