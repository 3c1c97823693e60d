#!/bin/bash
# Round-4 (driver round) post-re-image training recovery.  Run AFTER the
# evidence sequence (round5_open.sh) releases the chip.  One host core:
# the schedule keeps the chip busy with separation epochs (no mining
# dependency) while the host generates + mines the fine-tune corpus, then
# switches the chip to the localization hard-negative fine-tune — the
# recall lever — for the rest of the round.
#
#   A. generate first 800 train scenes (seed 4100, ~10 min)
#   B. seed separation checkpoints from release (epoch 22) and start the
#      sep trainer (epochs 23-30, the round-5 chain target)
#   C. generate train scenes 800-3499 (seed 4101 + skip_existing: fresh
#      RNG stream so resumed scenes are not duplicates of 0-799)
#   D. mine val 0-150 (fine-tune val set measures hard-negative
#      suppression; last session's recipe, commit c8731dd)
#   E. mine train scenes in chunks, refreshing .speechdata_ft/train
#      symlinks after each chunk
#   F. once val is fully mined and >=MIN_FT_SCENES train scenes are mined,
#      stop sep, export its best, seed loc checkpoints (epoch 15 — the
#      committed release is the mini-epoch-15 run's best) and start the
#      fine-tune; mining keeps running at nice 19
#
# Usage: nohup bash scripts/r4_recover_train.sh > .r4_recover.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
MIN_FT_SCENES="${MIN_FT_SCENES:-300}"
TRAIN_TOTAL="${TRAIN_TOTAL:-3500}"

echo "=== r4 recover $(date -u) ==="

# A. first train chunk
python -m acousticswarms_speech_tpu.data.generate_dataset .voices_v1 \
  .speechdata_v1 --n_outputs_train 800 --n_outputs_test 0 \
  --n_outputs_val 0 --seed 4100 --skip_existing 2>&1 | tail -2

# B. separation trainer (auto-resumes from the seeded checkpoint)
python scripts/seed_checkpoint_from_release.py experiments/speech_separation 22
nohup scripts/train_until_done.sh experiments/speech_separation \
  --print_interval 100 --max_steps_per_epoch 600 > /tmp/train_sep_r4.log 2>&1 &
echo $! > /tmp/sep_train.pid
echo "sep trainer started pid $(cat /tmp/sep_train.pid) $(date -u)"

# C. rest of the train corpus (fresh seed; skip_existing skips 0-799)
nice -n 19 python -m acousticswarms_speech_tpu.data.generate_dataset \
  .voices_v1 .speechdata_v1 --n_outputs_train "$TRAIN_TOTAL" \
  --n_outputs_test 0 --n_outputs_val 0 --seed 4101 --skip_existing \
  2>&1 | tail -2
echo "train corpus generated $(date -u)"

# D. mine the fine-tune val set
nice -n 19 python scripts/mine_range.py .speechdata_v1/val 0 150 \
  2>&1 | tail -2
echo "val mined $(date -u)"

# E+F. mine train in chunks; switch the chip to the fine-tune once ready
switched=0
chunk=100
idx=0
while [ "$idx" -lt "$TRAIN_TOTAL" ]; do
  end=$((idx + chunk)); [ "$end" -gt "$TRAIN_TOTAL" ] && end="$TRAIN_TOTAL"
  nice -n 19 python scripts/mine_range.py .speechdata_v1/train "$idx" "$end" \
    2>&1 | tail -1
  idx="$end"
  python scripts/build_ft_dir.py 2>&1 | tail -1
  mined=$(ls .speechdata_ft/train 2>/dev/null | wc -l)
  if [ "$switched" -eq 0 ] && [ "$mined" -ge "$MIN_FT_SCENES" ]; then
    echo "=== switching chip to the fine-tune ($mined mined) $(date -u) ==="
    if [ -f /tmp/sep_train.pid ] && kill -0 "$(cat /tmp/sep_train.pid)" 2>/dev/null; then
      kill "$(cat /tmp/sep_train.pid)" 2>/dev/null || true
    fi
    if [ -f /tmp/train_child.pid ] && kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null; then
      kill "$(cat /tmp/train_child.pid)"
      for i in $(seq 1 30); do
        kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null || break
        sleep 3
      done
      kill -9 "$(cat /tmp/train_child.pid)" 2>/dev/null || true
    fi
    sleep 5
    # only replace the committed sep release (val 0.397) if the resumed
    # run actually beat it
    python scripts/export_if_better.py experiments/speech_separation 0.397
    python scripts/seed_checkpoint_from_release.py \
      experiments/speech_localization 15
    nohup scripts/train_until_done.sh experiments/speech_localization \
      --print_interval 100 --max_steps_per_epoch 300 \
      > /tmp/train_ft_r4.log 2>&1 &
    echo $! > /tmp/train_ft.pid
    echo "fine-tune started pid $(cat /tmp/train_ft.pid) $(date -u)"
    switched=1
  fi
done
echo "=== mining complete ($(ls .speechdata_ft/train | wc -l) scenes) $(date -u) ==="
