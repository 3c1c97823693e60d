"""Mine SRP hard negatives for a range of train scenes on the CPU backend.

Usage: python scripts/mine_range.py <dataset_dir> <begin> <end>
Writes challeng_sample.json per scene (skips scenes already mined).
"""
import os
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from acousticswarms_speech_tpu.data.generate_srp_sample import mine_sample  # noqa: E402


def main():
    base, begin, end = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    t00 = time.time()
    done = 0
    for idx in range(begin, end):
        d = os.path.join(base, f"{idx:05d}")
        if not os.path.exists(os.path.join(d, "metadata.json")):
            continue
        if os.path.exists(os.path.join(d, "challeng_sample.json")):
            done += 1
            continue
        try:
            neg, pos = mine_sample(d)
            done += 1
            print(f"[{idx}] {len(neg)} neg {len(pos)} pos "
                  f"({time.time() - t00:.0f}s, {done} done)", flush=True)
        except Exception as e:  # keep mining on per-scene failures
            print(f"[{idx}] FAILED: {e}", flush=True)
    print("MINER DONE", done)


if __name__ == "__main__":
    main()
