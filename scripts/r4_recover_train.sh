#!/bin/bash
# Round-4 (driver round) post-re-image training recovery.  Run AFTER the
# evidence sequence (round5_open.sh) releases the chip.
#
# Mining measures ~5 s/scene on this host (".mine_val.log", 2026-08-19), so
# the mined fine-tune corpus is ready before the chip frees: the chip goes
# STRAIGHT to the localization hard-negative fine-tune (the recall lever —
# PERF.md round-4/5 labeled NMS accounting), with mining continuing at
# nice 19 and .speechdata_ft/train refreshed after every chunk (the trainer
# re-lists the dir on each bounded-chunk restart).  Separation (+epochs
# 23-30) only gets a slice later if the fine-tune val plateaus — decided
# manually from the curves.
#
#   A. ensure corpus + val mining complete (no-ops when already done)
#   B. wait until >=MIN_FT_SCENES train scenes are mined, then seed loc
#      checkpoints from the committed release (epoch 15 = the prior run's
#      best) and start the fine-tune
#   C. keep mining train scenes to TRAIN_TOTAL
#
# Usage: nohup bash scripts/r4_recover_train.sh > .r4_recover.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MIN_FT_SCENES="${MIN_FT_SCENES:-600}"
TRAIN_TOTAL="${TRAIN_TOTAL:-3500}"

echo "=== r4 recover $(date -u) ==="

# Take over from the opportunistic early miner (started while the evidence
# runbook held the chip) so two miners never race on the same range.
for pf in /tmp/mine_early2.pid /tmp/mine_early2_child.pid; do
  if [ -f "$pf" ] && kill -0 "$(cat "$pf")" 2>/dev/null; then
    kill "$(cat "$pf")" 2>/dev/null || true
  fi
done
sleep 3

# A. corpus + val mining (skip-fast when done)
python -m acousticswarms_speech_tpu.data.generate_dataset .voices_v1 \
  .speechdata_v1 --n_outputs_train 800 --n_outputs_test 0 \
  --n_outputs_val 0 --seed 4100 --skip_existing 2>&1 | tail -1
nice -n 19 python -m acousticswarms_speech_tpu.data.generate_dataset \
  .voices_v1 .speechdata_v1 --n_outputs_train "$TRAIN_TOTAL" \
  --n_outputs_test 0 --n_outputs_val 0 --seed 4101 --skip_existing \
  2>&1 | tail -1
nice -n 19 python scripts/mine_range.py .speechdata_v1/val 0 150 \
  2>&1 | tail -1
echo "corpus + val ready $(date -u)"

# B+C. mine train in chunks; start the fine-tune once enough is mined
started=0
chunk=100
idx=0
while [ "$idx" -lt "$TRAIN_TOTAL" ]; do
  end=$((idx + chunk)); [ "$end" -gt "$TRAIN_TOTAL" ] && end="$TRAIN_TOTAL"
  nice -n 19 python scripts/mine_range.py .speechdata_v1/train "$idx" "$end" \
    2>&1 | tail -1
  idx="$end"
  python scripts/build_ft_dir.py 2>&1 | tail -1
  mined=$(ls .speechdata_ft/train 2>/dev/null | wc -l)
  if [ "$started" -eq 0 ] && [ "$mined" -ge "$MIN_FT_SCENES" ]; then
    echo "=== starting the fine-tune ($mined mined) $(date -u) ==="
    python scripts/seed_checkpoint_from_release.py \
      experiments/speech_localization 15
    nohup scripts/train_until_done.sh experiments/speech_localization \
      --print_interval 100 --max_steps_per_epoch 300 \
      > /tmp/train_ft_r4.log 2>&1 &
    echo $! > /tmp/train_ft.pid
    echo "fine-tune started pid $(cat /tmp/train_ft.pid) $(date -u)"
    started=1
  fi
done
if [ "$started" -eq 0 ]; then
  echo "=== mining ended below MIN_FT_SCENES; starting fine-tune anyway ==="
  python scripts/seed_checkpoint_from_release.py \
    experiments/speech_localization 15
  nohup scripts/train_until_done.sh experiments/speech_localization \
    --print_interval 100 --max_steps_per_epoch 300 \
    > /tmp/train_ft_r4.log 2>&1 &
  echo $! > /tmp/train_ft.pid
fi
echo "=== mining complete ($(ls .speechdata_ft/train | wc -l) scenes) $(date -u) ==="
