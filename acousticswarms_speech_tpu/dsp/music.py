"""Wideband MUSIC pseudo-spectrum baseline.

Counterpart of /root/reference/sep/Traditional_SP/MUSIC_block.py: vectorized
per-bin covariance, Hermitian eigendecomposition, noise-subspace projection
against the precomputed grid mode vectors, per-bin normalization, averaged
over bins and over non-overlapping analysis windows (the windowing policy of
SRP_Prunning.MUSIC_Map_WINDOW, :436-467).

Runs host-side in numpy: this baseline path is rarely hot and linalg.eigh is
not guaranteed on every TPU runtime.
"""
from __future__ import annotations

import numpy as np

from ..constants import FS, SPEED_OF_SOUND


def grid_mode_vectors(grids: np.ndarray, mic_pos: np.ndarray,
                      freq_bins: np.ndarray, fs: int, nfft: int,
                      c: float = SPEED_OF_SOUND, sign: float = -1.0) -> np.ndarray:
    """Steering vectors exp(sign * 1j*omega*d/c): (K, M, G), mic z treated
    as 0 (geometry convention of SRP_Prunning.generate_mod_vector,
    :368-381).

    Note on `sign`: a source delayed by d/c appears in the STFT as
    exp(-1j*omega*d/c), so the physically matched steering vector uses
    sign=-1 (the default here).  The reference builds exp(+1j*...) — for its
    SRP the sign cancels in the pair products, but for MUSIC's subspace
    projection the +1j convention degrades localization markedly (verified
    on synthetic delayed scenes); we default to the correct sign."""
    dx = grids[None, :, 0] - mic_pos[:, None, 0]
    dy = grids[None, :, 1] - mic_pos[:, None, 1]
    dz = grids[None, :, 2]
    dist = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2) / c  # (M, G)
    omega = 2 * np.pi * fs * np.asarray(freq_bins) / nfft
    return np.exp(sign * 1j * omega[:, None, None] * dist[None])


def _stft(x: np.ndarray, nfft: int, hop: int) -> np.ndarray:
    n = (len(x) - nfft) // hop + 1
    idx = np.arange(nfft)[None, :] + hop * np.arange(n)[:, None]
    return np.fft.rfft(x[idx], axis=-1)  # (frames, bins)


class MUSIC:
    """num_src=3 wideband MUSIC over precomputed mode vectors
    (reference: MUSIC_block.py:6-46)."""

    def __init__(self, freq_bins: np.ndarray, mode_vec: np.ndarray,
                 num_src: int = 3, frequency_normalization: bool = True):
        self.freq_bins = np.asarray(freq_bins)
        self.num_freq = len(self.freq_bins)
        self.mode_vec = mode_vec  # (K, M, G)
        assert mode_vec.shape[0] == self.num_freq
        self.n_points = mode_vec.shape[-1]
        self.num_src = num_src
        self.frequency_normalization = frequency_normalization

    def process(self, X: np.ndarray) -> np.ndarray:
        """X: (M, F_all, frames) complex.  Returns (G,)."""
        M = X.shape[0]
        Xs = np.transpose(X, (2, 1, 0))[:, self.freq_bins, :]  # (frames, K, M)
        C = np.matmul(Xs[..., None], np.conj(Xs[..., None, :])).mean(0)  # (K,M,M)

        w, v = np.linalg.eigh(C)
        Es = v[..., -self.num_src:]  # (K, M, num_src) signal subspace

        identity = np.eye(M)[None]
        cross = identity - Es @ np.conj(np.swapaxes(Es, -1, -2))  # (K, M, M)

        mode = np.transpose(self.mode_vec, (2, 0, 1))  # (G, K, M)
        denom = np.matmul(
            np.conj(mode[..., None, :]), np.matmul(cross[None], mode[..., None])
        )[..., 0, 0]  # (G, K)
        Pssl = 1.0 / np.abs(denom)

        if self.frequency_normalization:
            Pssl = Pssl / np.max(Pssl, axis=0, keepdims=True)
        return np.sum(Pssl, axis=1) / self.num_freq

    # Reference-style alias
    MUSIC_process = process


def music_map_window(signal: np.ndarray, geom, freq_bins: np.ndarray,
                     nfft: int, window: int | None = None) -> np.ndarray:
    """Windowed MUSIC map over the geometry's cluster grid, averaging over
    non-overlapping windows (reference: SRP_Prunning.py:436-467)."""
    if window is None:
        window = 36000 if signal.shape[1] >= 72000 else 24000
    mode = grid_mode_vectors(geom.grids, geom.mic_pos, freq_bins, FS, nfft)
    node = MUSIC(freq_bins, mode)
    T = signal.shape[1]
    hop = nfft // 4
    acc = np.zeros(geom.num_clusters)
    runs = 0
    for j in range(T // window):
        seg = signal[:, j * window : (j + 1) * window]
        X = np.stack([_stft(ch, nfft, hop).T for ch in seg])
        acc += node.process(X)
        runs += 1
    return acc / max(runs, 1)
