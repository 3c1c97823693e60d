"""Input normalization shared by both networks.

Matches the reference exactly (SpeakerLocalization/network.py:28-47 and
SpeakerSeparation/network.py:32-51): inputs are quantized to 16-bit, the
per-item mean across microphones is the normalization reference, and std uses
Bessel's correction (torch.Tensor.std default).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize_input(data: jnp.ndarray):
    """data: (B, M, T) -> (normalized, means (B,1,1), stds (B,1,1))."""
    data = jnp.round(data * 2 ** 15) / 2 ** 15
    ref = data.mean(axis=1)  # (B, T): average across microphones
    means = ref.mean(axis=1)[:, None, None]
    stds = ref.std(axis=1, ddof=1)[:, None, None]
    data = (data - means) / stds
    return data, means, stds


def unnormalize_input(data: jnp.ndarray, means, stds) -> jnp.ndarray:
    return data * stds + means
