"""Training losses: L1, composite L1+SNR, masked SI-SDR.

Counterpart of /root/reference/sep/training/losses.py and the loss registry
in base_network.py:12-30.  The SNR/SI-SDR terms reimplement the asteroid
`SingleSrcNegSDR` semantics (zero-mean, eps-stabilized, negated dB) the
reference builds on.  All losses are jnp-pure and jit/grad-safe: the
reference's data-dependent `if any(mask)` branches become masked means.
"""
from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def neg_sdr(est: jnp.ndarray, target: jnp.ndarray, sdr_type: str = "snr",
            zero_mean: bool = True) -> jnp.ndarray:
    """Negative SDR per item; est/target: (N, T) -> (N,).

    sdr_type 'snr': plain SNR; 'sisdr': scale-invariant projection.
    """
    if zero_mean:
        est = est - est.mean(axis=1, keepdims=True)
        target = target - target.mean(axis=1, keepdims=True)
    if sdr_type == "sisdr":
        dot = jnp.sum(est * target, axis=1, keepdims=True)
        s_energy = jnp.sum(target ** 2, axis=1, keepdims=True) + EPS
        s_target = dot * target / s_energy
    else:
        s_target = target
    e_noise = est - s_target
    ratio = (jnp.sum(s_target ** 2, axis=1) + EPS) / (
        jnp.sum(e_noise ** 2, axis=1) + EPS
    )
    return -10.0 * jnp.log10(ratio)


def l1_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(output - gt))


def composite_loss(output: jnp.ndarray, gt: jnp.ndarray, r: float = 0.0,
                   neg_scale: float = 1.0) -> jnp.ndarray:
    """CompositeLoss (losses.py:6-46): all-zero (negative) targets get L1
    only, scaled by `neg_scale`; positive targets get r*L1 + (1-r)*SNR."""
    gt2 = gt[:, 0]
    out2 = output[:, 0]
    neg_mask = (jnp.max(jnp.abs(gt2), axis=1) == 0)  # (N,)

    l1_per = jnp.mean(jnp.abs(out2 - gt2), axis=1)  # (N,)
    snr_per = neg_sdr(out2, gt2, "snr")

    n_neg = jnp.sum(neg_mask)
    n_pos = jnp.sum(~neg_mask)
    loss = jnp.where(
        n_neg > 0,
        jnp.sum(jnp.where(neg_mask, l1_per, 0.0)) / jnp.maximum(n_neg, 1)
        * neg_scale,
        0.0,
    )
    pos_term = (
        jnp.sum(jnp.where(~neg_mask, l1_per, 0.0)) / jnp.maximum(n_pos, 1) * r
        + jnp.sum(jnp.where(~neg_mask, snr_per, 0.0)) / jnp.maximum(n_pos, 1)
        * (1 - r)
    )
    loss = loss + jnp.where(n_pos > 0, pos_term, 0.0)
    return loss


def sisdr_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """SISDRLoss (losses.py:48-66): mean negative SI-SDR over non-silent
    targets."""
    gt2 = gt[:, 0]
    out2 = output[:, 0]
    pos_mask = (jnp.max(jnp.abs(gt2), axis=1) > 0)
    per = neg_sdr(out2, gt2, "sisdr")
    n = jnp.maximum(jnp.sum(pos_mask), 1)
    return jnp.sum(jnp.where(pos_mask, per, 0.0)) / n


def get_loss_fn(name: str):
    """Loss registry matching BaseNetwork.set_loss (base_network.py:12-30)."""
    if name == "l1":
        return l1_loss
    if name == "snr":
        return lambda o, g: composite_loss(o, g, r=0.0, neg_scale=1.0)
    if name == "snr_w_scaled_neg":
        return lambda o, g: composite_loss(o, g, r=0.0, neg_scale=500.0)
    if name == "fused":
        return lambda o, g: composite_loss(o, g, r=0.05, neg_scale=1.0)
    if name == "sisdr":
        return sisdr_loss
    raise ValueError(f"Unknown loss '{name}'")
