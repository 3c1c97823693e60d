"""Seed an experiment's checkpoints/ from its committed release weights.

After a host re-image only git-tracked state survives — per-epoch
checkpoints and optimizer state are lost, but each stage's best params
live on as `release/params_f16.msgpack` (scripts/export_release.py).
This writes those weights (cast back to the training dtype) as
`checkpoints/<exp>_<epoch>.msgpack` so train.py's auto-resume continues
from `epoch+1` with the released params instead of restarting the stage
from its pretrain_path (train.py resume order: latest checkpoint wins,
reference train.py:117-137).  The optimizer restarts fresh — the resume
path explicitly tolerates that.

Usage: python scripts/seed_checkpoint_from_release.py <experiment_dir> <epoch>
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from acousticswarms_speech_tpu.training import checkpoints as ckpt  # noqa: E402
from acousticswarms_speech_tpu.training.experiment import load_model_from_exp  # noqa: E402


def main():
    exp_dir, epoch = sys.argv[1].rstrip("/"), int(sys.argv[2])
    name = os.path.basename(exp_dir)
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    if ckpt.latest_checkpoint(ckpt_dir, name) is not None:
        print(f"[seed] {ckpt_dir} already has checkpoints; nothing to do")
        return
    # load_model_from_exp falls back to release/params_f16.msgpack and
    # casts to the model's training dtype (experiment.py:96-106).
    _, params = load_model_from_exp(exp_dir, mode="best")
    os.makedirs(ckpt_dir, exist_ok=True)
    out = os.path.join(ckpt_dir, f"{name}_{epoch}.msgpack")
    ckpt.save_params(out, params)
    print(f"[seed] wrote {out} (resume will start at epoch {epoch + 1})")


if __name__ == "__main__":
    main()
