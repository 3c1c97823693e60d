#!/bin/bash
# Round-5 final close (session 2): stop training, guarded export, one-process
# clean+degraded traced probes with the shipping defaults, analyzers, bench
# cache pre-warm.  ~70 min total.
#
# Usage: bash scripts/round5_close2.sh
set -u
cd "$(dirname "$0")/.."
log=.round5_close2.log
echo "=== round5 close2 $(date -u) ===" | tee -a "$log"

# stop the restart wrapper first so it cannot resurrect the child
for pf in /tmp/train_ft.pid; do
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
  echo "trainer stopped $(date -u)" | tee -a "$log"
fi
sleep 3

# guarded export: only beat the committed release (val 0.005148)
python scripts/export_if_better.py experiments/speech_localization 0.005148 \
  2>&1 | tee -a "$log"

# clean traced probe + degraded probe, ONE process (programs compile once)
rm -rf .results_r5_final .results_r5_final_degraded
ACOUSTIC_TRACE_POWERS=1 SPOT_POWER_THRESHOLD1=0.004 \
python -m acousticswarms_speech_tpu.pipeline.evaluate .speechdata_v1/test \
  --spot_experiment_dir experiments/speech_localization \
  --sep_experiment_dir experiments/speech_separation \
  --results_folder .results_r5_final \
  --use_fp16 --cached_init --num_shards 27 --shard_index 0 \
  --degrade_shard_indices 0 2>&1 | tail -8 | tee -a "$log"

echo "=== analyze clean ===" | tee -a "$log"
python -m acousticswarms_speech_tpu.pipeline.analyze .results_r5_final \
  2>&1 | tee -a "$log"
echo "=== analyze degraded ===" | tee -a "$log"
python -m acousticswarms_speech_tpu.pipeline.analyze \
  .results_r5_final_degraded 2>&1 | tee -a "$log"
echo "=== NMS replay (clean traces) ===" | tee -a "$log"
python scripts/replay_nms.py .results_r5_final 2>&1 | tee -a "$log"

echo "=== bench (final weights; pre-warms the driver cache) ===" | tee -a "$log"
python bench.py 2>&1 | tail -3 | tee -a "$log"
echo "=== close2 done $(date -u) ===" | tee -a "$log"
