#!/bin/bash
# Round-3 stage switch: stop the localization fine-tune and resume the
# separation run (auto-resumes from experiments/speech_separation/checkpoints).
set -e
cd "$(dirname "$0")/.."

# Stop the restart wrapper first, then the python child it recorded
# (train_until_done.sh), so the trainer is not resurrected mid-switch.
if [ -f /tmp/train_ft.pid ] && kill -0 "$(cat /tmp/train_ft.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_ft.pid)" 2>/dev/null || true
fi
if [ -f /tmp/train_child.pid ] && kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null; then
  kill "$(cat /tmp/train_child.pid)"
  for i in $(seq 1 20); do
    kill -0 "$(cat /tmp/train_child.pid)" 2>/dev/null || break
    sleep 3
  done
  kill -9 "$(cat /tmp/train_child.pid)" 2>/dev/null || true
  echo "fine-tune trainer stopped"
fi

# 2000-step cap ~= 57 min/epoch at batch 1: one checkpointed epoch fits the
# remaining round-3 chip window even on the grown (4,100+-scene) corpus.
nohup scripts/train_until_done.sh experiments/speech_separation \
  --print_interval 100 --max_steps_per_epoch 2000 > /tmp/train_sep_r3.log 2>&1 &
echo $! > /tmp/train_sep.pid
echo "separation started, pid $(cat /tmp/train_sep.pid), log /tmp/train_sep_r3.log"
