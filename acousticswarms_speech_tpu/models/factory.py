"""Model construction, init-time weight rescaling, and experiment mapping.

`rescale_params` reproduces the reference's `rescale_module` initialization
(/root/reference/sep/training/SpeakerLocalization/network.py:10-26): every
Conv1d / ConvTranspose1d weight (and its bias) is divided by
sqrt(std(weight) / reference_scale) right after random init.

`create_model` resolves a network by the experiment `model_name`, mirroring
the reference's importlib dispatch (sep/training/train.py:61-63) so
description.json files remain the configuration contract.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from .localization import SpotNet
from .separation import SepNet

MODEL_REGISTRY = {
    "SpeakerLocalization": SpotNet,
    "SpeakerSeparation": SepNet,
}


def create_model(model_name: str, model_params: Mapping[str, Any]):
    cls = MODEL_REGISTRY[model_name]
    params = dict(model_params)
    params.pop("device", None)
    if "stride_list" in params:
        params["stride_list"] = tuple(params["stride_list"])
    return cls(**params)


def rescale_params(params, reference: float = 0.1):
    """Post-init rescale of all conv-like weights, matching rescale_module.

    A conv-like param is a 3-D 'weight' leaf; its sibling 'bias' is scaled by
    the same factor.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    scales: dict[tuple, jnp.ndarray] = {}
    for path, leaf in flat:
        keys = tuple(getattr(p, "key", None) for p in path)
        if keys and keys[-1] == "weight" and leaf.ndim == 3:
            std = leaf.std()
            scales[keys[:-1]] = jnp.sqrt(std / reference)

    def rescale_leaf(path, leaf):
        keys = tuple(getattr(p, "key", None) for p in path)
        if keys and keys[-1] in ("weight", "bias") and keys[:-1] in scales:
            return leaf / scales[keys[:-1]]
        return leaf

    return jax.tree_util.tree_map_with_path(rescale_leaf, params)


def init_model(model, rng, example_inputs, reference: float | None = 0.1):
    """Initialize params and apply the reference's rescale transform.

    Both steps run under one jit each: on remote-dispatch TPU runtimes,
    eager per-param execution costs ~0.5 s of relay latency per op, which
    for a ~400-parameter model turns a 2 s init into minutes."""
    params = jax.jit(model.init)(rng, *example_inputs)
    if reference is not None:
        params = jax.jit(lambda p: rescale_params(p, reference))(params)
    return params


def param_count(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
