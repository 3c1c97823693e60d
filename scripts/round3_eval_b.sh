#!/bin/bash
# Round-3 finish, step B: the wide held-out evaluation, one process
# (shapes/programs compile once): clean shards 0+1 of 3 (200 scenes) then
# a robot-condition degraded pass over shard 0 (100 scenes), followed by
# the analyzer on both result folders.  Tuned spot-power thresholds are
# expected to already be the constants.py defaults (or exported in env).
set -e
cd "$(dirname "$0")/.."

rm -rf .results_speech_r3 .results_speech_r3_degraded
python -m acousticswarms_speech_tpu.pipeline.evaluate .speechdata_v1/test \
  --spot_experiment_dir experiments/speech_localization \
  --sep_experiment_dir experiments/speech_separation \
  --results_folder .results_speech_r3 \
  --use_fp16 --cached_init --num_shards 9 --shard_indices 0,1,2 \
  --degrade_shard_indices 0
echo "=== analyze clean ==="
python -m acousticswarms_speech_tpu.pipeline.analyze .results_speech_r3
echo "=== analyze degraded ==="
python -m acousticswarms_speech_tpu.pipeline.analyze .results_speech_r3_degraded
