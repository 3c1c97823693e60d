#!/bin/bash
# Round-5 opening sequence — bank chip evidence FIRST (rounds 3/4 lesson:
# relay outages and re-images eat parked evidence), then hand the chip to
# training for the rest of the round.
#
#   A. bounded relay probe (fail fast with a clear message if the relay is
#      down — host-side work still possible: corpus growth, mining, replay
#      tuning from committed traces)
#   B. if the corpus is missing (re-imaged VM), regenerate seeded test/val
#      first (~0.7 s/scene), train corpus + mining after evidence is banked
#   C. wide eval (102 clean + 34 degraded) + bench with committed weights
#   D. 12-scene traced probe + analyzers (labels + replayable NMS traces)
#   E. hand off to the hard-negative fine-tune (epochs from wherever the
#      committed release left off), then separation (+20-40 epochs)
#
# Usage: bash scripts/round5_open.sh
set -u
cd "$(dirname "$0")/.."
log=.round5_open.log
echo "=== round5 open $(date -u) ===" | tee -a "$log"

echo "--- relay probe ---" | tee -a "$log"
if ! timeout 120 python -c "import jax; print(jax.devices())" 2>&1 | tee -a "$log"; then
    echo "RELAY DOWN: do host-side work (corpus/mining/replay), retry later" | tee -a "$log"
    exit 2
fi

if [ ! -d .speechdata_v1/test ]; then
    echo "--- regenerating voice bank + seeded test/val corpora ---" | tee -a "$log"
    [ -d .voices_v1 ] || python -m acousticswarms_speech_tpu.data.voicegen \
        .voices_v1 --n_speakers 50 --clips_per_speaker 12 --seed 0 \
        2>&1 | tail -2 | tee -a "$log"
    # round-4 recovery settings: seed 37, 300 test / 150 val, no train yet
    # (train + mining go AFTER the chip evidence is banked — 1 host core)
    python -m acousticswarms_speech_tpu.data.generate_dataset .voices_v1 \
        .speechdata_v1 --n_outputs_train 0 --n_outputs_test 300 \
        --n_outputs_val 150 --seed 37 --skip_existing \
        2>&1 | tail -2 | tee -a "$log"
fi

echo "--- wide eval (clean shards 0-2 + degraded shard 0) ---" | tee -a "$log"
bash scripts/round3_eval_b.sh 2>&1 | tail -20 | tee -a "$log"

echo "--- bench ---" | tee -a "$log"
python bench.py 2>&1 | tail -3 | tee -a "$log"

echo "--- traced probe + analyzers + replay ---" | tee -a "$log"
bash scripts/round4_probe.sh .results_r5_probe 2>&1 | tail -40 | tee -a "$log"
python scripts/replay_nms.py .results_r5_probe 2>&1 | tee -a "$log"

echo "=== evidence banked; commit results, then start training ===" | tee -a "$log"
echo "next: timeout-bounded chunks of" | tee -a "$log"
echo "  python -m acousticswarms_speech_tpu.training.train experiments/speech_localization" | tee -a "$log"
echo "(~1150 s/epoch chunk), export_release.py + commit on each new val best;" | tee -a "$log"
echo "then scripts/switch_to_separation.sh for the separation epochs." | tee -a "$log"
