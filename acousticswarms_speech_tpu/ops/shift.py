"""Batched per-channel time shifts on device.

TPU-native counterpart of the reference's `roll_by_gather`
(/root/reference/sep/training/JointModel/network.py:12-25) and the zero-fill
roll used at separation inference
(/root/reference/sep/training/SpeakerSeparation/network.py:513-522).

Both are expressed as a single gather with precomputed/broadcast index
arithmetic so a whole candidate batch shifts in one fused XLA op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def roll_channels(mix: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Circular per-channel roll.

    mix: (M, T); shifts: (M,) int32 — channel c rolls by +shifts[c]
    (same convention as torch.roll / roll_by_gather with `-shifts` gather).
    Returns (M, T).

    Implemented as a take_along_axis gather with precomputed modular
    indices.  (A concat + vmapped-dynamic_slice variant was tried and
    reverted: it compiles pathologically slowly on the axon TPU compiler.)
    """
    M, T = mix.shape
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    src = jnp.mod(t - shifts[:, None].astype(jnp.int32), T)
    return jnp.take_along_axis(mix, src, axis=1)


def roll_channels_batch(mix: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Batched circular roll: mix (M, T), shifts (B, M) -> (B, M, T).

    This is the hot data-movement op of the spotforming sweep
    (JointModel/network.py:80-83): every candidate hypercube center aligns the
    mixture to its TDoA before the spot net runs.
    """
    return jax.vmap(lambda s: roll_channels(mix, s))(shifts)


def roll_zero_fill(mix: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """Per-channel roll with zero fill of wrapped samples.

    mix: (M, T); shifts: (M,) — matches SpeakerSeparation infer_sample:
    channel rolls by +shift, then the wrapped-in region is zeroed
    (shift>0 zeros the head, shift<0 zeros the tail).
    """
    M, T = mix.shape
    rolled = roll_channels(mix, shifts)
    t = jnp.arange(T, dtype=jnp.int32)[None, :]
    s = shifts[:, None].astype(jnp.int32)
    valid = jnp.where(s > 0, t >= s, t < T + s)
    return jnp.where(valid, rolled, 0.0)


def roll_zero_fill_batch(mix: jnp.ndarray, shifts: jnp.ndarray) -> jnp.ndarray:
    """mix (M, T), shifts (S, M) -> (S, M, T) with zero fill."""
    return jax.vmap(lambda s: roll_zero_fill(mix, s))(shifts)
