"""Export an experiment's best checkpoint as git-tracked float16 release
weights (<exp>/release/params_f16.msgpack).

Per-epoch training checkpoints live in gitignored `<exp>/checkpoints/` and
do not survive workspace resets between build rounds; release weights keep
the benchmark and eval pipelines reproducible from a fresh clone.
float16 storage halves the file size; parameters are cast back to the model
dtype on load (training/experiment.py).

Usage: python scripts/export_release.py <exp_dir> [<exp_dir> ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def export(exp_dir: str) -> str:
    import jax
    import numpy as np
    from flax import serialization

    from acousticswarms_speech_tpu.training.experiment import (
        load_model_from_exp,
    )

    _, params = load_model_from_exp(exp_dir, mode="best")
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, dtype=np.float16), params)
    out_dir = os.path.join(exp_dir, "release")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "params_f16.msgpack")
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(f16))
    print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB)")
    return out


if __name__ == "__main__":
    import jax

    jax.config.update("jax_platforms", "cpu")
    for d in sys.argv[1:]:
        export(d)
