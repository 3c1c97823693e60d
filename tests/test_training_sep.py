"""Separation-model training smoke test (tiny config)."""
import json
import os

import numpy as np
import pytest

from acousticswarms_speech_tpu.constants import FS
from tests.test_training import MIC, _make_dataset


@pytest.mark.slow
def test_sep_train_loop_runs(tmp_path):
    from acousticswarms_speech_tpu.training.train import train

    ds = str(tmp_path / "ds")
    _make_dataset(ds, n_samples=2, T=8000)
    exp_dir = str(tmp_path / "exp_sep_tiny")
    os.makedirs(exp_dir)
    desc = {
        "model_name": "SpeakerSeparation",
        "sr": FS,
        "model_params": {
            "n_mics": 7, "max_speakers": 3, "channels": 4, "growth": 2,
            "encoder_channels": 16, "stride_list": [4, 4, 4],
            "kernel_size": 5, "residual_layers": 1,
            "residual_dilation_factor": 2, "num_head": 2, "ffw_dim": 8,
            "bottleneck_layers": 1, "bottleneck_ksize": 7,
        },
        "lr_sched_params": {"lr_min": 1e-8, "factor": 0.5, "patience": 3,
                             "dont_halve_until_epoch": 1},
        "training_params": {"gradient_clip": 1, "epochs": 1, "lr": 3e-4,
                             "batch_size": 2, "loss": "sisdr"},
        "train_set_params": {"input_dir": ds, "n_mics": 7, "n_speakers": 3,
                              "compression_prob": 0},
        "test_set_params": {"input_dir": ds, "n_mics": 7, "n_speakers": 3,
                             "compression_prob": 0},
    }
    with open(os.path.join(exp_dir, "description.json"), "w") as f:
        json.dump(desc, f)

    tl, vl = train(exp_dir, seed=0, max_steps_per_epoch=1)
    assert len(tl) == 1 and np.isfinite(tl[0]) and np.isfinite(vl[0])
    assert os.path.exists(
        os.path.join(exp_dir, "checkpoints", "exp_sep_tiny_0.msgpack")
    )
