#!/bin/bash
# Per-release NMS/threshold re-tune loop, one command (VERDICT r4 #9).
#
# The merge/power thresholds encode the CURRENT nets' leakage profile, so
# every weight release invalidates them.  This chains the manual
# three-script dance into one run:
#
#   1. traced 12-scene probe with the committed releases
#      (ACOUSTIC_TRACE_POWERS=1, uncensored coarse threshold)
#   2. exact offline NMS replay over the merge-threshold grid
#      + labeled TDoA-deviation stats + gate sweep + elect A/B
#   3. spot-power threshold knee (tune_thresholds.py)
#   4. provenance diff: the probe folder's config.json vs the defaults
#      currently frozen in the tree
#
# It PRINTS the decision table and leaves freezing to the operator (a
# frozen default must land with its evidence in the same commit —
# constants.py / search/clustering.py env-default lines).
#
# Usage: scripts/retune_release.sh [results_dir]   (default .results_retune)
set -u
cd "$(dirname "$0")/.."
out="${1:-.results_retune}"

bash scripts/round4_probe.sh "$out"

echo "=== NMS merge-threshold replay ==="
python scripts/replay_nms.py "$out"
echo "=== labeled TDoA-deviation stats ==="
python scripts/replay_nms.py "$out" --devs
echo "=== TDoA gate sweep ==="
python scripts/replay_nms.py "$out" --gate
echo "=== elect A/B ==="
python scripts/replay_nms.py "$out" --elect

echo "=== frozen defaults now in effect (probe provenance) ==="
python - "$out" <<'EOF'
import json, sys
cfg = json.load(open(sys.argv[1] + "/config.json"))
for k in sorted(cfg):
    if any(t in k for t in ("NMS_", "SPOT_", "THRESHOLD")):
        print(f"  {k} = {cfg[k]}")
EOF
echo "=== done: pick knees from the tables above, update the env-default"
echo "    lines (search/clustering.py, constants.py), and commit together"
echo "    with $out as evidence ==="
