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

    TPU note: implemented as concat + per-row dynamic_slice (two contiguous
    HBM copies) rather than an index gather — TPU gathers over the time axis
    are orders of magnitude slower than sliced copies.
    """
    M, T = mix.shape
    doubled = jnp.concatenate([mix, mix], axis=1)  # (M, 2T)
    starts = jnp.mod(-shifts.astype(jnp.int32), T)  # out[i] = x[(i - s) % T]

    def one(row, start):
        return jax.lax.dynamic_slice(row, (start,), (T,))

    return jax.vmap(one)(doubled, starts)


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
