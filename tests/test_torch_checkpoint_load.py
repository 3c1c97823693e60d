"""End-to-end torch-checkpoint fallback in load_model_from_exp."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import torch

from acousticswarms_speech_tpu.models import SpotNet

CFG = dict(n_mics=4, kernel_size=7, stride_list=[2, 2], channels=4, growth=2,
           encoder_channels=8, encoder_kernel_size=33, encoder_stride=16,
           residual_layers=2, residual_dilation_factor=2, num_head=2,
           ffw_dim=8, num_transformer_layers=1)


def _to_torch_names(tree):
    sd = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
            return
        p = path
        simple = {"preproc", "reference_bypass", "mask_encoder",
                  "output_decoder"}
        if p[0] in simple:
            name = f"{p[0]}.{p[-1]}"
        elif p[0].startswith(("encoder_", "decoder_")):
            kind, i = p[0].split("_")
            if p[1] == "res":
                j = p[2].split("_")[1]
                name = f"{kind}.module_list.{i}.res.seq.{j}.{p[3]}.{p[4]}"
            elif p[1] == "upsample_conv":
                name = f"{kind}.module_list.{i}.upsample.conv.{p[2]}"
            else:
                name = f"{kind}.module_list.{i}.{p[1]}.{p[2]}"
        elif p[0] == "bottleneck":
            i = p[1].split("_")[1]
            name = f"bottleneck.transf.layers.{i}." + ".".join(p[2:])
        else:
            raise AssertionError(p)
        sd[name] = torch.tensor(np.asarray(node))

    walk(tree["params"], [])
    return sd


def test_load_model_from_exp_torch_fallback(tmp_path):
    from acousticswarms_speech_tpu.training.experiment import load_model_from_exp

    exp = tmp_path / "exp_torch"
    ckpts = exp / "checkpoints"
    os.makedirs(ckpts)
    desc = {
        "model_name": "SpeakerLocalization",
        "sr": 48000,
        "model_params": CFG,
        "lr_sched_params": {}, "training_params": {},
        "train_set_params": {}, "test_set_params": {},
    }
    with open(exp / "description.json", "w") as f:
        json.dump(desc, f)

    model = SpotNet(**{**CFG, "stride_list": tuple(CFG["stride_list"])})
    x = jnp.zeros((1, 4, 128))
    w = jnp.ones((1, 2))
    source_params = model.init(jax.random.PRNGKey(7), x, w)
    torch.save(_to_torch_names(source_params), str(ckpts / "exp_torch_3.pt"))

    loaded_model, loaded_params = load_model_from_exp(str(exp), mode="best")

    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.normal(size=(1, 4, 128)).astype(np.float32))
    y_src = model.apply(source_params, xin, w)
    y_loaded = loaded_model.apply(loaded_params, xin, w)
    np.testing.assert_allclose(np.asarray(y_loaded), np.asarray(y_src),
                               rtol=1e-6, atol=1e-7)


def test_load_model_from_exp_with_experiment_name_key(tmp_path):
    """Regression: a description.json that sets `experiment_name` must still
    resolve checkpoints from `<exp>/checkpoints/` with the filenames train()
    writes (basename-prefixed msgpack) — round-1 bug looked them up under
    `<exp>/<experiment_name>/` instead."""
    import jax
    import jax.numpy as jnp
    from acousticswarms_speech_tpu.training import checkpoints as ckpt
    from acousticswarms_speech_tpu.training.experiment import (
        load_model_from_exp,
    )

    exp = tmp_path / "myexp"
    ckpts = exp / "checkpoints"
    os.makedirs(ckpts)
    desc = {
        "model_name": "SpeakerLocalization",
        "experiment_name": "published_name",  # differs from dir basename
        "sr": 48000,
        "model_params": CFG,
        "lr_sched_params": {}, "training_params": {},
        "train_set_params": {}, "test_set_params": {},
    }
    with open(exp / "description.json", "w") as f:
        json.dump(desc, f)

    model = SpotNet(**{**CFG, "stride_list": tuple(CFG["stride_list"])})
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, 128)),
                        jnp.ones((1, 2)))
    # train() writes with the directory-basename prefix
    ckpt.save_params(str(ckpts / "myexp_2.msgpack"), params)

    loaded_model, loaded = load_model_from_exp(str(exp), mode="last")
    ref_leaf = np.asarray(
        jax.tree_util.tree_leaves(params)[0])
    got_leaf = np.asarray(jax.tree_util.tree_leaves(loaded)[0])
    np.testing.assert_array_equal(got_leaf, ref_leaf)


def test_load_model_from_exp_strict_unmatched_keys(tmp_path):
    """Unmatched torch keys must be a hard error by default (silently keeping
    random template values breaks quality claims downstream)."""
    import pytest
    from acousticswarms_speech_tpu.training.experiment import (
        load_model_from_exp,
    )

    exp = tmp_path / "exp_bad"
    ckpts = exp / "checkpoints"
    os.makedirs(ckpts)
    desc = {
        "model_name": "SpeakerLocalization",
        "sr": 48000,
        "model_params": CFG,
        "lr_sched_params": {}, "training_params": {},
        "train_set_params": {}, "test_set_params": {},
    }
    with open(exp / "description.json", "w") as f:
        json.dump(desc, f)
    torch.save({"totally.bogus.key": torch.zeros(3)},
               str(ckpts / "exp_bad_0.pt"))

    with pytest.raises(ValueError, match="unmatched"):
        load_model_from_exp(str(exp), mode="best")
