#!/bin/bash
# Round-5 chain: wait for the separation trainer (epochs 23-30) to finish,
# export its best checkpoint to release/, then immediately start the
# localization hard-negative fine-tune (resumed at epoch 16, lr 1.5e-4,
# mined-only train dir, freshly mined val set) so the chip never idles.
set -u
cd "$(dirname "$0")/.."
log=/tmp/chain_r5.log
echo "=== chain start $(date -u) ===" >> "$log"

# Wait for the train_until_done wrapper to exit (completes at epoch 30).
while [ -f /tmp/sep_train.pid ] && kill -0 "$(cat /tmp/sep_train.pid)" 2>/dev/null; do
  sleep 60
done
echo "sep trainer done $(date -u)" >> "$log"
sleep 10

python scripts/export_release.py experiments/speech_separation >> "$log" 2>&1

nohup scripts/train_until_done.sh experiments/speech_localization \
  --print_interval 100 --max_steps_per_epoch 300 > /tmp/train_ft_r5.log 2>&1 &
echo $! > /tmp/train_ft.pid
echo "fine-tune started pid $(cat /tmp/train_ft.pid) $(date -u)" >> "$log"
