"""On-device pairwise SI-SDR via the Gram matrix.

The reference's clustering stages compare spotformed candidates pairwise
with SI-SDR on the host (Mic_Array.py:353, 432).  For zero-mean signals the
entire K x K SI-SDR matrix is a closed form of the Gram matrix G = X X^T:

    a_ij  = G_ij / G_jj                      (scale of est_i onto ref_j)
    |a s_j|^2        = G_ij^2 / G_jj
    |e_i - a s_j|^2  = G_ii - G_ij^2 / G_jj
    sisdr(i est, j ref) = 10 log10( (G_ij^2/G_jj) / (G_ii - G_ij^2/G_jj) )

so one (K, T) @ (T, K) MXU matmul replaces K^2 host-side passes over the
waveforms — and, critically for remote-dispatch runtimes, no waveform ever
leaves the device for clustering decisions.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


@jax.jit
def sisdr_matrix(x: jnp.ndarray) -> jnp.ndarray:
    """x: (K, T) zero-mean signals.  Returns (K, K) with [i, j] =
    si_sdr(estimate=x[i], reference=x[j]) matching utils.metrics.si_sdr."""
    xf = x.astype(jnp.float32)
    gram = jnp.einsum("it,jt->ij", xf, xf, preferred_element_type=jnp.float32)
    diag = jnp.diagonal(gram)
    s_target = gram ** 2 / jnp.maximum(diag[None, :], EPS)  # |a s_j|^2
    e_res = jnp.maximum(diag[:, None] - s_target, 0.0) + EPS
    return 10.0 * jnp.log10(jnp.maximum(s_target, 1e-30) / e_res)
