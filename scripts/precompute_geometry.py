"""Precompute per-scene geometry caches for an eval dataset (CPU).

The per-mic-configuration search geometry (5 cm grid -> TDoA clusters) is
deterministic host work; building it ahead of time lets the TPU eval pass
load each scene's geometry from the npz cache instead of recomputing it
serially between device dispatches.

Usage: python scripts/precompute_geometry.py .speechdata_v1/test [grid_size]
"""
import json
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from acousticswarms_speech_tpu.dsp.geometry import build_geometry  # noqa: E402
from acousticswarms_speech_tpu.pipeline.evaluate import (  # noqa: E402
    preprocess_metadata,
)


def main():
    base = sys.argv[1]
    grid_size = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05
    dirs = sorted(d for d in os.listdir(base)
                  if os.path.isdir(os.path.join(base, d)))
    t0 = time.time()
    for k, d in enumerate(dirs):
        curr = os.path.join(base, d)
        meta_path = os.path.join(curr, "metadata.json")
        if not os.path.exists(meta_path):
            continue
        with open(meta_path) as f:
            metadata = json.load(f)
        (_, mic_positions, _, _, _, speaker_range) = \
            preprocess_metadata(metadata)
        build_geometry(mic_positions, speaker_range, grid_size=grid_size,
                       cache_dir=curr)
        if k % 25 == 0:
            print(f"[{k}/{len(dirs)}] {time.time() - t0:.0f}s", flush=True)
    print(f"done {len(dirs)} scenes in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
