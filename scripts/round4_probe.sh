#!/bin/bash
# Round-4 post-fine-tune probe: traced 12-scene eval (every 27th test scene)
# with uncensored thresholds, then the NMS/retention analyzers.  One process
# (one compile); ~15-20 min once compiled.
#
# Usage: scripts/round4_probe.sh [results_dir]
set -u
cd "$(dirname "$0")/.."
out="${1:-.results_r4_probe}"
rm -rf "$out"

ACOUSTIC_TRACE_POWERS=1 SPOT_POWER_THRESHOLD1=0.004 \
python -m acousticswarms_speech_tpu.pipeline.evaluate .speechdata_v1/test \
  --spot_experiment_dir experiments/speech_localization \
  --sep_experiment_dir experiments/speech_separation \
  --results_folder "$out" \
  --use_fp16 --cached_init --num_shards 27 --shard_index 0

echo "=== analyze ==="
python -m acousticswarms_speech_tpu.pipeline.analyze "$out"
echo "=== NMS probe ==="
python scripts/analyze_probe.py "$out"
echo "=== retention root-cause (sub-patch aware) ==="
python scripts/analyze_retention.py "$out" --dataset .speechdata_v1/test \
  --coarse_thr 0.004
echo "=== threshold tuner ==="
python scripts/tune_thresholds.py "$out"
