"""Quickstart: simulate a room, localize and separate the speakers.

Runs entirely self-contained (no datasets, no checkpoints): builds a
synthetic 2-speaker scene with the in-repo image-source simulator, runs the
localization-by-separation search with the classical delay-and-sum
spotformer, and reports estimated positions vs ground truth.

    python examples/quickstart.py            # on the default backend
    JAX_PLATFORMS=cpu python examples/quickstart.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from acousticswarms_speech_tpu import JointPipeline
from acousticswarms_speech_tpu.constants import FS
from acousticswarms_speech_tpu.data.roomsim import ShoeBox
from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor

MIC_POS = np.array([
    [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02], [3.7, 1.0, 0.02],
    [3.3, 1.5, 0.02], [3.3, 0.5, 0.02], [3.6, 1.15, 0.02],
])
SOURCES = [np.array([4.8, 2.4, 0.4]), np.array([2.2, 3.4, 0.3])]
ROI = [1.0, 6.0, 0.2, 5.0, 0.1, 0.62]


def make_scene(duration_s=1.5, seed=0):
    rng = np.random.default_rng(seed)
    T = int(duration_s * FS)
    room = ShoeBox([7.0, 6.0, 2.3], fs=FS, max_order=4, absorption=0.7)
    room.add_microphone_array(MIC_POS.T)
    for p in SOURCES:
        x = rng.normal(size=T) * 0.3
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1, 3)
                             * np.arange(T) / FS + rng.uniform(0, 6)), 0, None)
        room.add_source(p, x * env)
    return room.simulate(return_premix=True).sum(axis=0)[:, :T]


def main():
    print("simulating scene ...")
    mix = make_scene()

    # Pipeline with the classical spotformer (no trained weights needed).
    # For neural spotforming + separation, construct with
    # JointPipeline.from_experiments(spot_exp_dir, sep_exp_dir).
    pipe = JointPipeline.__new__(JointPipeline)
    pipe.spot_model = DelayAndSumExecutor()
    pipe.sep_model = None
    pipe.times = [0.0] * 5
    pipe.previous_config = None
    pipe.mic_processor = None

    print("building search geometry ...")
    pipe.setup(MIC_POS, ROI)

    print("localizing ...")
    patches, audio_loc, *_rest = pipe.localize_by_separation(mix)
    print(f"stage times (s): SRP {pipe.times[0]:.2f}, coarse "
          f"{pipe.times[1]:.2f}, fine {pipe.times[2]:.2f}, "
          f"NMS {pipe.times[3]:.2f}")

    print(f"\nfound {len(patches)} speaker(s):")
    for k, pf in enumerate(patches):
        pos = pf[0].center_pos()
        d = min(np.linalg.norm(pos[:2] - s[:2]) for s in SOURCES)
        print(f"  #{k}: ({pos[0]:.2f}, {pos[1]:.2f})  "
              f"nearest GT speaker at {d:.2f} m")
    print("\nGT positions:",
          [[float(x) for x in np.round(s[:2], 2)] for s in SOURCES])


if __name__ == "__main__":
    main()
