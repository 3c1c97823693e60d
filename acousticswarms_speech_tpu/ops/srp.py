"""SRP-PHAT steered-response map as one batched, all-real XLA program.

TPU-native redesign of the reference's windowed SRP-PHAT
(/root/reference/sep/Traditional_SP/SRP_Prunning.py:368-434):

- The reference loops over analysis windows, runs a CPU STFT per channel,
  then a per-frequency-bin `torch.mm` covariance loop (198 bins) and a
  broadcasted dot with a precomputed steering table, taking a running max.
- Here every (window, bin) covariance is computed by one einsum over a
  batched on-device band-limited DFT (two MXU matmuls, see ops/stft.py), and
  the steering contraction for ALL windows is one (G, K*P) x (K*P, W) matmul
  on the MXU, followed by a max-reduce over the window axis.  The whole path
  is real-valued (re/im planes) — no complex dtypes, no FFT op — so it runs
  on every TPU runtime and nothing leaves HBM until the final (G,) map.

The steering table stores pair phase products directly:
v_i * conj(v_j) = exp(1j * omega_k * (d_i - d_j) / c)
(the reference builds the same values via an (M, M) outer product and an
upper-triangle mask, SRP_Prunning.py:221-243).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .stft import dft_bases, stft_windowed_bins


def pair_indices(num_mic: int) -> tuple[np.ndarray, np.ndarray]:
    """Upper-triangle (i < j) microphone pair indices, row-major — the same
    enumeration as the reference's `(av < av.T).flatten()` mask."""
    ii, jj = np.triu_indices(num_mic, k=1)
    return ii, jj


def build_steering_table(
    grids: np.ndarray,
    mic_pos: np.ndarray,
    freq_bins: np.ndarray,
    fs: int,
    nfft: int,
    c: float = 343.0,
    dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Device-resident steering table for the SRP contraction.

    grids: (G, 3) TDoA-cluster center positions.
    mic_pos: (M, 2 or 3) — matching the reference's generate_mod_vector
    (SRP_Prunning.py:368-381), microphone z is treated as 0 while the grid z
    is used as-is.

    Returns (steer_re, steer_im), each (G, K*P) with K = len(freq_bins) and
    P = M*(M-1)/2 pairs.
    """
    grids = np.asarray(grids, dtype=np.float64)
    mic_pos = np.asarray(mic_pos, dtype=np.float64)
    M = mic_pos.shape[0]
    dx = grids[None, :, 0] - mic_pos[:, None, 0]
    dy = grids[None, :, 1] - mic_pos[:, None, 1]
    dz = grids[None, :, 2]  # mic z treated as 0 (reference quirk)
    dist = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2) / c  # (M, G) seconds

    ii, jj = pair_indices(M)
    ddiff = dist[ii] - dist[jj]  # (P, G)

    omega = 2.0 * np.pi * fs * np.asarray(freq_bins, dtype=np.float64) / nfft  # (K,)
    K, (P, G) = len(omega), ddiff.shape
    steps = np.diff(omega)
    if K > 1 and np.allclose(steps, steps[0]):
        # Consecutive-bin fast path: e^{i w_k d} = e^{i w_0 d} (e^{i dw d})^k
        # — one complex64 multiply per bin instead of float64 cos+sin over
        # the full (K, P, G) phase tensor (the steering build dominates
        # per-scene MicArray setup; this is ~10x faster at equal accuracy,
        # phase drift over K~40 steps is <1e-5).
        ddiff_t = np.ascontiguousarray(ddiff.T)  # (G, P)
        phasor = np.exp(1j * omega[0] * ddiff_t).astype(np.complex64)
        step_ph = np.exp(1j * steps[0] * ddiff_t).astype(np.complex64)
        steer_re = np.empty((G, K, P), dtype=np.float32)
        steer_im = np.empty((G, K, P), dtype=np.float32)
        for k in range(K):
            steer_re[:, k, :] = phasor.real
            steer_im[:, k, :] = phasor.imag
            if k + 1 < K:
                phasor *= step_ph
        steer_re = steer_re.reshape(G, K * P)
        steer_im = steer_im.reshape(G, K * P)
    else:
        phase = omega[:, None, None] * ddiff[None, :, :]  # (K, P, G)
        steer_re = np.cos(phase).transpose(2, 0, 1).reshape(G, -1)
        steer_im = np.sin(phase).transpose(2, 0, 1).reshape(G, -1)
    return jnp.asarray(steer_re, dtype=dtype), jnp.asarray(steer_im, dtype=dtype)


@functools.partial(jax.jit, static_argnames=("window", "nfft", "hop", "tol"))
def srp_phat_map(
    signal: jnp.ndarray,
    steer_re: jnp.ndarray,
    steer_im: jnp.ndarray,
    cos_b: jnp.ndarray,
    sin_b: jnp.ndarray,
    window: int,
    nfft: int,
    hop: int,
    tol: float = 1e-8,
) -> jnp.ndarray:
    """Windowed SRP-PHAT map.

    signal: (M, T) float; steer_*: (G, K*P); cos_b/sin_b: (nfft, K) DFT bases
    for the selected bins.
    Returns (G,) float32 map = max over analysis windows (clamped at 0, as
    the reference's zero-initialized running max does, SRP_Prunning.py:430).
    """
    M = signal.shape[0]
    step = window // 2

    re, im = stft_windowed_bins(
        signal.astype(jnp.float32), cos_b, sin_b, window, step, nfft, hop
    )  # each (W, M, frames, K)

    mag = jnp.sqrt(re * re + im * im)
    mag = jnp.maximum(mag, tol)
    pre = re / mag
    pim = im / mag

    frames = re.shape[2]
    ii, jj = pair_indices(M)
    # Cross-channel covariance of phase-only spectra, per (window, bin):
    # C_mn = sum_t p_m conj(p_n) = (RmRn + ImIn) + 1j (ImRn - RmIn)
    cov_re = (
        jnp.einsum("wmtk,wntk->wkmn", pre, pre, preferred_element_type=jnp.float32)
        + jnp.einsum("wmtk,wntk->wkmn", pim, pim, preferred_element_type=jnp.float32)
    ) / frames
    cov_im = (
        jnp.einsum("wmtk,wntk->wkmn", pim, pre, preferred_element_type=jnp.float32)
        - jnp.einsum("wmtk,wntk->wkmn", pre, pim, preferred_element_type=jnp.float32)
    ) / frames
    cov_re = cov_re[:, :, ii, jj]  # (W, K, P)
    cov_im = cov_im[:, :, ii, jj]
    W = cov_re.shape[0]
    cov_re = cov_re.reshape(W, -1)
    cov_im = cov_im.reshape(W, -1)

    # Re(cov * steer) summed over bins and pairs:
    # one (G, K*P) @ (K*P, W) matmul for all windows at once.
    maps = steer_re @ cov_re.T - steer_im @ cov_im.T
    norm = cos_b.shape[1] * len(ii)
    maps = maps / norm  # (G, W)
    return jnp.maximum(jnp.max(maps, axis=1), 0.0)


def srp_window_size(T: int) -> int:
    """Analysis-window policy of the reference (Mic_Array.py:160-163)."""
    return 36000 if T >= 72000 else 24000


GRID_BUCKET = 2048  # G padded to a multiple -> one compile per (T, G-bucket)


class SrpMapComputer:
    """Bundles the device-resident tables and jit entry for one geometry.

    The grid-cluster count G differs for every microphone configuration; the
    steering tables are zero-padded to a G bucket so the compiled map
    program is reused across rooms (a fresh remote compile per room would
    dominate evaluation time)."""

    def __init__(self, grids, mic_pos, freq_bins, fs, nfft, c=343.0,
                 grid_bucket: int = GRID_BUCKET):
        self.nfft = nfft
        self.hop = nfft // 4
        self.freq_bins = np.asarray(freq_bins)
        self.num_grids = len(grids)
        steer_re, steer_im = build_steering_table(
            grids, mic_pos, self.freq_bins, fs, nfft, c
        )
        g_pad = max(grid_bucket,
                    ((self.num_grids + grid_bucket - 1) // grid_bucket)
                    * grid_bucket)
        pad = g_pad - self.num_grids
        if pad:
            steer_re = jnp.pad(steer_re, ((0, pad), (0, 0)))
            steer_im = jnp.pad(steer_im, ((0, pad), (0, 0)))
        self.steer_re, self.steer_im = steer_re, steer_im
        cos_b, sin_b = dft_bases(nfft, self.freq_bins)
        self.cos_b = jnp.asarray(cos_b)
        self.sin_b = jnp.asarray(sin_b)

    def __call__(self, signal, window: int) -> jnp.ndarray:
        full = srp_phat_map(
            jnp.asarray(signal), self.steer_re, self.steer_im,
            self.cos_b, self.sin_b, window, self.nfft, self.hop,
        )
        return full[: self.num_grids]
