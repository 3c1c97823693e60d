"""Framed STFT for SRP-PHAT, designed for the TPU MXU.

Matches the semantics of pyroomacoustics `transform.stft.analysis(x, nfft,
nfft // 4)` used by the reference's SRP stage
(/root/reference/sep/Traditional_SP/SRP_Prunning.py:404-409): rectangular
window (pra's default `win=None`), hop = nfft // 4, and
`n_frames = (T - nfft) // hop + 1` full frames.

TPU note: XLA FFT is not available on all TPU runtimes (and the SRP stage
only ever consumes 198 of the 1025 rfft bins), so the band-limited DFT is
computed as two real matmuls against precomputed cos/sin bases:
(frames, nfft) @ (nfft, K).  That keeps the whole STFT on the MXU with no
complex dtypes on the hot path and is cheaper than a full FFT for K << nfft.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def num_frames(T: int, nfft: int, hop: int) -> int:
    return (T - nfft) // hop + 1


def dft_bases(nfft: int, bins: np.ndarray, dtype=np.float32):
    """cos/sin DFT bases for the selected bins.

    Returns (cos_basis, sin_basis), each (nfft, K), such that for a real
    frame x: Re(rfft(x))[k] = x @ cos_basis[:, k] and
    Im(rfft(x))[k] = -(x @ sin_basis[:, k])."""
    n = np.arange(nfft)[:, None]
    k = np.asarray(bins)[None, :]
    ang = 2.0 * np.pi * n * k / nfft
    return np.cos(ang).astype(dtype), np.sin(ang).astype(dtype)


def _frame_indices(T: int, nfft: int, hop: int) -> np.ndarray:
    starts = np.arange(num_frames(T, nfft, hop)) * hop
    return starts[:, None] + np.arange(nfft)[None, :]


@functools.partial(jax.jit, static_argnames=("nfft", "hop"))
def stft_bins(x: jnp.ndarray, cos_b: jnp.ndarray, sin_b: jnp.ndarray,
              nfft: int, hop: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Band-limited STFT of the last axis via MXU matmuls.

    x: (..., T) real; cos_b/sin_b: (nfft, K).
    Returns (re, im), each (..., n_frames, K), where re + 1j*im equals
    rfft(frame)[bins]."""
    T = x.shape[-1]
    idx = _frame_indices(T, nfft, hop)
    frames = x[..., idx]  # (..., n_frames, nfft)
    re = jnp.einsum("...tn,nk->...tk", frames, cos_b,
                    preferred_element_type=jnp.float32)
    im = -jnp.einsum("...tn,nk->...tk", frames, sin_b,
                     preferred_element_type=jnp.float32)
    return re, im


def stft_windowed_bins(signal: jnp.ndarray, cos_b: jnp.ndarray, sin_b: jnp.ndarray,
                       window: int, step: int, nfft: int, hop: int):
    """Band-limited STFT of overlapping analysis windows.

    Mirrors the reference's per-window STFT loop (SRP_Prunning.py:401-412):
    window j covers samples [j*step, j*step + window), for all j with
    j*step + window <= T and j < T//step - 1.

    signal: (M, T).  Returns (re, im): (n_windows, M, frames_per_window, K).
    """
    M, T = signal.shape
    frame_number = T // step - 1
    n_windows = sum(
        1 for j in range(max(frame_number, 0)) if j * step + window <= T
    )
    starts = np.arange(n_windows) * step
    idx = starts[:, None] + np.arange(window)[None, :]
    wins = signal[:, idx]            # (M, W, window)
    wins = jnp.swapaxes(wins, 0, 1)  # (W, M, window)
    return stft_bins(wins, cos_b, sin_b, nfft, hop)


# ---------------------------------------------------------------------------
# Full-spectrum complex STFT (host / CPU path): used by oracle baselines and
# tests.  Uses XLA FFT, which is available on CPU.
# ---------------------------------------------------------------------------
@functools.partial(jax.jit, static_argnames=("nfft", "hop"))
def stft_analysis(x: jnp.ndarray, nfft: int, hop: int) -> jnp.ndarray:
    """STFT of the last axis: (..., T) -> (..., n_frames, nfft//2+1)."""
    idx = _frame_indices(x.shape[-1], nfft, hop)
    frames = x[..., idx]
    return jnp.fft.rfft(frames, n=nfft, axis=-1)
