"""TOPS (Test of Orthogonality of Projected Subspaces) wideband DoA baseline.

Counterpart of /root/reference/sep/Traditional_SP/TOPS_block.py: near-field
variant operating over the geometry's candidate grid positions.  For each
grid point, signal subspaces at a reference bin are phase-transformed to the
other bins and projected onto those bins' noise subspaces; the inverse of the
smallest singular value of the stacked projections is the spatial spectrum.

Vectorized over grid points per frequency (the reference loops per point and
per bin); host-side numpy.
"""
from __future__ import annotations

import numpy as np

from ..constants import FS, SPEED_OF_SOUND
from .music import MUSIC, _stft, grid_mode_vectors


class TOPS(MUSIC):
    def __init__(self, mic_pos: np.ndarray, grids_pos: np.ndarray,
                 freq_bins: np.ndarray, mode_vec: np.ndarray, nfft: int,
                 c: float = SPEED_OF_SOUND, fs: int = FS, num_src: int = 3):
        super().__init__(freq_bins, mode_vec, num_src=num_src)
        mic_center = mic_pos.mean(axis=0)
        self.mic_pos = mic_pos - mic_center
        self.grids_pos = grids_pos - mic_center
        self.nfft = nfft
        self.c = c
        self.fs = fs

    def process(self, X: np.ndarray) -> np.ndarray:
        """X: (M, F_all, frames).  Returns (G,)."""
        M = X.shape[0]
        G = self.grids_pos.shape[0]
        K = self.num_freq

        # reference bin: largest total power among selected bins
        max_bin = int(np.argmax(
            np.sum(np.sum(np.abs(X[:, self.freq_bins, :]), axis=0), axis=1)
        ))
        f0 = self.freq_bins[max_bin]

        Xs = np.transpose(X, (2, 1, 0))[:, self.freq_bins, :]  # (frames,K,M)
        C = np.matmul(Xs[..., None], np.conj(Xs[..., None, :])).mean(0)

        w, v = np.linalg.eigh(C)
        F_sig = v[..., -self.num_src:]          # (K, M, num_src)
        W_noise = v[..., : M - self.num_src]    # (K, M, M - num_src)

        # Phase transformation per grid point and bin
        f = (1.0 / self.nfft / self.c * 2 * np.pi * self.fs
             * (self.freq_bins - f0))  # (K,)
        path_s = np.linalg.norm(self.grids_pos, axis=1)  # (G,)
        delta = path_s[None, :] - np.linalg.norm(
            self.grids_pos[None, :, :] - self.mic_pos[:, None, :], axis=-1
        )  # (M, G)
        Phi = np.exp(1j * f[:, None, None] * delta[None])  # (K, M, G)

        F0 = F_sig[max_bin]  # (M, num_src)
        values = np.zeros(G)
        # D blocks: U_k W_k with U_k = conj(diag(Phi_k) F0)^T per grid point
        # Stacked over the K-1 non-reference bins -> smallest singular value.
        D = np.zeros((G, self.num_src, (M - self.num_src) * (K - 1)),
                     dtype=np.complex128)
        col = 0
        for k in range(K):
            if k == max_bin:
                continue
            scaled = np.conj(Phi[k].T[:, :, None] * F0[None])  # (G, M, num_src)
            Uk = np.swapaxes(scaled, 1, 2)  # (G, num_src, M)
            D[:, :, col * (M - self.num_src):(col + 1) * (M - self.num_src)] = \
                Uk @ W_noise[k][None]
            col += 1
        s = np.linalg.svd(D, compute_uv=False)  # (G, num_src)
        values = 1.0 / np.maximum(s[:, -1], 1e-12)
        return values

    _process = process


def tops_map_window(signal: np.ndarray, geom, freq_bins: np.ndarray,
                    nfft: int, window: int = 72000) -> np.ndarray:
    """Windowed TOPS map (reference: SRP_Prunning.py:470-497 — fixed 72000-
    sample windows, averaged)."""
    mode = grid_mode_vectors(geom.grids, geom.mic_pos, freq_bins, FS, nfft)
    node = TOPS(geom.mic_pos, geom.grids, freq_bins, mode, nfft=nfft)
    T = signal.shape[1]
    hop = nfft // 4
    acc = np.zeros(geom.num_clusters)
    runs = 0
    for j in range(max(T // window, 0)):
        seg = signal[:, j * window : (j + 1) * window]
        X = np.stack([_stft(ch, nfft, hop).T for ch in seg])
        acc += node.process(X)
        runs += 1
    if runs == 0:  # signal shorter than the TOPS window: single truncated run
        X = np.stack([_stft(ch, nfft, hop).T for ch in signal])
        acc = node.process(X)
        runs = 1
    return acc / runs
