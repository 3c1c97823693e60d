#!/bin/bash
# Restart-on-leak training loop.
#
# The axon relay client leaks every H2D transfer's payload in host RSS
# (~one batch per train step, measured in /tmp/leak_repro*.py probes), so a
# long training run eventually exhausts host RAM.  train.py exits with code
# 75 at an epoch boundary (after saving params + optimizer state) once RSS
# crosses ACOUSTIC_RSS_EXIT_GB; this wrapper restarts it and auto-resume
# continues from the last epoch.  Also restarts after a hard OOM kill (137)
# so an unattended run survives; exits 0 only when training completes.
#
# Usage: scripts/train_until_done.sh <experiment_dir> [train.py args...]
set -u
dir="$1"
shift
for i in $(seq 1 "${MAX_RESTARTS:-40}"); do
    python -m acousticswarms_speech_tpu.training.train "$dir" "$@" &
    child=$!
    echo "$child" > "${CHILD_PID_FILE:-/tmp/train_child.pid}"
    wait "$child"
    rc=$?
    if [ "$rc" -eq 0 ]; then
        echo "[train_until_done] training complete"
        exit 0
    fi
    echo "[train_until_done] rc=$rc; restart $i ($(date -u +%H:%M:%S))" >&2
    sleep 5
done
echo "[train_until_done] giving up after ${MAX_RESTARTS:-40} restarts" >&2
exit 1
