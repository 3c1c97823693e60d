"""Shoebox image-source room simulator.

Replacement for the pyroomacoustics `ShoeBox` dependency used by the
reference's dataset generator (/root/reference/datasets/generate_dataset.py:
580-631).  Implements the classic Allen & Berkley (1979) image-source model
with fractional-delay windowed-sinc injection, the same formulation
pyroomacoustics uses:

- image positions R = ((-1)^p * s + 2 r .* L) over p in {0,1}^3, r in Z^3
- per-image amplitude = beta^(#wall hits) / (4 pi d), beta = sqrt(1 - a)
- each image contributes an 81-tap windowed-sinc at its fractional delay

Vectorized numpy; used for dataset generation, test fixtures and benchmarks
(offline — the inference pipeline never calls this).
"""
from __future__ import annotations

import itertools

import numpy as np
from scipy.signal import fftconvolve

FDL = 81  # fractional delay filter length (matches pra's default)


def _image_sources(src: np.ndarray, room: np.ndarray, max_order: int):
    """All image positions and wall-hit counts up to `max_order` reflections.

    Returns (positions (N, 3), hits (N,)).  Fully vectorized: the (p, r)
    lattice is materialized with broadcasting instead of a Python loop (the
    loop dominated dataset-generation time)."""
    dims = len(room)
    src = np.asarray(src, dtype=np.float64)[:dims]
    room = np.asarray(room, dtype=np.float64)
    n = max_order // 2 + 1
    ax = np.arange(-n, n + 1)
    grids = np.meshgrid(*([ax] * dims), indexing="ij")
    r = np.stack([g.ravel() for g in grids], axis=1)  # (R, dims)
    ps = np.array(list(itertools.product((0, 1), repeat=dims)))  # (P, dims)
    hits = (np.abs(r[None, :, :] - ps[:, None, :])
            + np.abs(r)[None, :, :]).sum(-1)  # (P, R)
    mask = hits <= max_order
    pos = ((1 - 2 * ps)[:, None, :] * src[None, None, :]
           + 2.0 * r[None, :, :] * room[None, None, :])  # (P, R, dims)
    return pos[mask], hits[mask]


def compute_rir(src: np.ndarray, mic: np.ndarray, room: np.ndarray,
                absorption: float, max_order: int, fs: int,
                c: float = 343.0, images=None) -> np.ndarray:
    """Room impulse response from `src` to `mic` (1-D float array).

    `images`: optional precomputed (positions, hits) from `_image_sources`
    — they depend only on the source, so callers simulating many mics reuse
    them."""
    if images is None:
        images = _image_sources(np.asarray(src, dtype=np.float64),
                                np.asarray(room, dtype=np.float64),
                                max_order)
    positions, hits = images
    beta = np.sqrt(max(1.0 - absorption, 0.0))
    d = np.linalg.norm(positions - np.asarray(mic, dtype=np.float64), axis=1)
    d = np.maximum(d, 1e-3)
    amp = beta ** hits / (4.0 * np.pi * d)
    delay = d / c * fs  # fractional samples

    max_delay = float(delay.max())
    rir_len = int(np.ceil(max_delay)) + FDL + 1
    rir = np.zeros(rir_len)

    half = (FDL - 1) // 2
    t0 = np.floor(delay).astype(int)
    frac = delay - t0
    # windowed sinc centered at the fractional delay
    taps = np.arange(-half, half + 1)[None, :]  # (1, FDL)
    arg = taps - frac[:, None]
    kernel = np.sinc(arg) * np.hanning(FDL + 2)[1:-1][None, :]
    start = t0[:, None] + taps
    valid = (start >= 0) & (start < rir_len)
    np.add.at(rir, np.clip(start, 0, rir_len - 1),
              np.where(valid, amp[:, None] * kernel, 0.0))
    return rir


class ShoeBox:
    """Minimal pyroomacoustics-compatible shoebox room."""

    def __init__(self, p, fs: int, max_order: int = 10,
                 absorption: float = 0.3, c: float = 343.0):
        self.room = np.asarray(p, dtype=np.float64)
        self.fs = fs
        self.max_order = max_order
        self.absorption = absorption
        self.c = c
        self.mic_array: np.ndarray | None = None
        self.sources: list[tuple[np.ndarray, np.ndarray]] = []

    def add_microphone_array(self, mic_positions: np.ndarray) -> None:
        """mic_positions: (dims, M) like pra, or (M, dims)."""
        mp = np.asarray(mic_positions, dtype=np.float64)
        if mp.shape[0] in (2, 3) and mp.shape[0] < mp.shape[1]:
            mp = mp.T
        self.mic_array = mp  # (M, dims)

    def add_source(self, position, signal) -> None:
        self.sources.append((np.asarray(position, dtype=np.float64),
                             np.asarray(signal, dtype=np.float64)))

    def simulate(self, return_premix: bool = True) -> np.ndarray:
        """Returns premix (n_sources, n_mics, T) like
        `pra.ShoeBox.simulate(return_premix=True)` — per-source reverberant
        images at every microphone, trimmed/padded to the max mixed length."""
        assert self.mic_array is not None and self.sources
        M = self.mic_array.shape[0]
        S = len(self.sources)

        outs = []
        for src, sig in self.sources:
            images = _image_sources(src, self.room, self.max_order)
            per_mic = []
            for m in range(M):
                rir = compute_rir(src, self.mic_array[m], self.room,
                                  self.absorption, self.max_order, self.fs,
                                  self.c, images=images)
                per_mic.append(fftconvolve(sig, rir))
            outs.append(per_mic)

        T = max(len(x) for pm in outs for x in pm)
        premix = np.zeros((S, M, T))
        for s in range(S):
            for m in range(M):
                x = outs[s][m]
                premix[s, m, : len(x)] = x
        return premix


def inverse_sabine(rt60: float, room_dim) -> tuple[float, int]:
    """Absorption + ISM order for a target RT60 (Sabine's formula), matching
    pyroomacoustics' helper used at generate_dataset.py:751."""
    room_dim = np.asarray(room_dim, dtype=np.float64)
    V = float(np.prod(room_dim))
    if len(room_dim) == 3:
        S = 2.0 * (room_dim[0] * room_dim[1] + room_dim[1] * room_dim[2]
                   + room_dim[0] * room_dim[2])
    else:
        S = 2.0 * np.sum(room_dim)
    c = 343.0
    a = 24.0 * np.log(10.0) * V / (c * S * rt60)
    if a >= 1.0:
        raise ValueError(
            "evaluation of parameters failed. room may be too large for "
            "required RT60."
        )
    R = np.min(room_dim) / 2.0
    max_order = int(np.ceil(c * rt60 / (2.0 * R)))
    return float(a), max_order
