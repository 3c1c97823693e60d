#!/bin/bash
# Round-3 stage switch: stop stage-1, archive the round-2 fine-tune
# checkpoints (so the fine-tune warm-starts from the NEW stage-1 best via
# pretrain_path instead of resuming round-2 epochs), start the fine-tune.
set -e
cd "$(dirname "$0")/.."

# Stop the restart wrapper first, then the python child it recorded
# (train_until_done.sh), so the trainer is not resurrected mid-switch.
if [ -f /tmp/train_s1.pid ] && kill -0 "$(cat /tmp/train_s1.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_s1.pid)" 2>/dev/null || true
fi
if [ -f /tmp/train_child.pid ] && kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_child.pid)"
  for i in $(seq 1 20); do
    kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null || break
    sleep 3
  done
  kill -9 "$(cat /tmp/train_child.pid)" 2>/dev/null || true
  echo "stage-1 trainer stopped"
fi

FT=experiments/speech_localization
if [ -n "$(ls -A $FT/checkpoints 2>/dev/null)" ]; then
  ARCHIVE=$FT/checkpoints_round2
  mkdir -p "$ARCHIVE"
  mv "$FT"/checkpoints/* "$ARCHIVE"/
  echo "archived round-2 fine-tune checkpoints to $ARCHIVE"
fi

nohup scripts/train_until_done.sh "$FT" \
  --print_interval 50 > /tmp/train_ft_r3.log 2>&1 &
echo $! > /tmp/train_ft.pid
echo "fine-tune started, pid $(cat /tmp/train_ft.pid), log /tmp/train_ft_r3.log"
