"""On-device candidate power metrics for the spotforming sweep.

The reference computes, per spotformed candidate on host (numpy/scipy):
- mean-subtracted total power sum((x - mean)^2)
  (/root/reference/sep/helpers/local_utils_3d.py:349-354)
- max sliding-window RMS via scipy.ndimage.uniform_filter1d with
  mode='constant', origin=-window//2 (local_utils_3d.py:13-17), i.e. the
  mean over input[i .. i+window) with zero padding past the end.

Here both reduce on device inside the sweep so stage-1/2 candidate selection
transfers two scalars per candidate instead of the full waveform.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("window",))
def windowed_rms_max(x: jnp.ndarray, window: int = 12000) -> jnp.ndarray:
    """x: (B, T) mean-subtracted.  Returns (B,): max over i of
    sqrt(mean(x[i:i+window]^2)) with zero padding past the end —
    matching uniform_filter1d(x**2, window, mode='constant',
    origin=-window//2) followed by sqrt/max."""
    B, T = x.shape
    x2 = x * x
    padded = jnp.pad(x2, ((0, 0), (0, window)))
    cs = jnp.cumsum(padded, axis=1)
    sums = cs[:, window - 1 : window - 1 + T] - jnp.pad(
        cs[:, :T], ((0, 0), (1, 0))
    )[:, :T]
    means = sums / window
    return jnp.sqrt(jnp.max(means, axis=1))


@jax.jit
def candidate_powers(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """x: (B, T) raw spotformed outputs.  Returns
    (x_centered, total_power (B,), windowed_rms_max (B,))."""
    centered = x - x.mean(axis=1, keepdims=True)
    total = jnp.sum(centered * centered, axis=1)
    win = windowed_rms_max(centered)
    return centered, total, win
