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
    ax = np.arange(-n, n + 1, dtype=np.int32)
    grids = np.meshgrid(*([ax] * dims), indexing="ij")
    r = np.stack([g.ravel() for g in grids], axis=1)  # (R, dims)
    # hits(r, p) >= 2*||r||_1 - dims, so the L1 ball prescreens the lattice
    # (keeps ~17% in 3-D) before the 2^dims mirror expansion
    r = r[np.abs(r).sum(1) * 2 - dims <= max_order]
    ps = np.array(list(itertools.product((0, 1), repeat=dims)),
                  dtype=np.int32)  # (P, dims)
    hits = (np.abs(r[None, :, :] - ps[:, None, :])
            + np.abs(r)[None, :, :]).sum(-1)  # (P, R)
    mask = hits <= max_order
    pos = ((1 - 2 * ps)[:, None, :].astype(np.float64) * src[None, None, :]
           + 2.0 * r[None, :, :] * room[None, None, :])  # (P, R, dims)
    return pos[mask], hits[mask]


def prune_images(images, mic_center: np.ndarray, absorption: float,
                 rel_cutoff: float, margin: float = 2.0):
    """Drop images whose amplitude upper bound is below `rel_cutoff` of the
    strongest image as seen from anywhere within `margin` meters of
    `mic_center` (mic-independent, so one pruning serves a whole array).

    The default 1e-4 cutoff is -80 dB relative to the direct path — 20 dB
    below the RT60 definition's -60 dB tail end, i.e. inaudible — and cuts
    the high-order image count ~7x (measured: order-110 rooms keep 14%)."""
    if rel_cutoff <= 0.0:
        return images
    positions, hits = images
    beta = np.sqrt(max(1.0 - absorption, 0.0))
    d = np.linalg.norm(positions - np.asarray(mic_center, dtype=np.float64),
                       axis=1)
    log_beta = np.log(max(beta, 1e-30))
    # amp bound: beta^hits / (4 pi max(d - margin, d_floor))
    bound = hits * log_beta - np.log(4.0 * np.pi
                                     * np.maximum(d - margin, 1e-3))
    keep = bound >= bound.max() + np.log(rel_cutoff)
    return positions[keep], hits[keep]


def _scatter_sinc(rir_len: int, delay: np.ndarray, amp: np.ndarray,
                  fdl: int) -> np.ndarray:
    """Accumulate `fdl`-tap windowed-sinc pulses at fractional delays."""
    half = (fdl - 1) // 2
    t0 = np.floor(delay).astype(np.int64)
    frac = (delay - t0).astype(np.float32)
    taps = np.arange(-half, half + 1, dtype=np.float32)[None, :]
    arg = taps - frac[:, None]
    window = np.hanning(fdl + 2)[1:-1].astype(np.float32)[None, :]
    kernel = (np.sinc(arg) * window) * amp[:, None]
    start = t0[:, None] + np.arange(-half, half + 1, dtype=np.int64)
    flat = np.clip(start, 0, rir_len - 1).ravel()
    vals = np.where((start >= 0) & (start < rir_len), kernel, 0.0).ravel()
    return np.bincount(flat, weights=vals, minlength=rir_len)


EARLY_WINDOW_S = 0.008  # early reflections rendered with the full sinc
FDL_TAIL = 11           # tail fractional-delay taps (near-allpass to ~19 kHz)


def compute_rir(src: np.ndarray, mic: np.ndarray, room: np.ndarray,
                absorption: float, max_order: int, fs: int,
                c: float = 343.0, images=None,
                rel_cutoff: float = 0.0, exact: bool = False) -> np.ndarray:
    """Room impulse response from `src` to `mic` (1-D float array).

    `images`: optional precomputed (positions, hits) from `_image_sources`
    — they depend only on the source, so callers simulating many mics reuse
    them.  `rel_cutoff` > 0 additionally prunes images below that fraction
    of the strongest image's amplitude (see `prune_images`).

    Rendering is hybrid: images arriving within EARLY_WINDOW_S of the direct
    path (the TDoA-carrying part) get the full 81-tap fractional-delay sinc;
    the diffuse tail uses an 11-tap sinc (near-allpass to ~19 kHz, ~7x
    cheaper).  `exact=True` renders everything with the full sinc."""
    if images is None:
        images = _image_sources(np.asarray(src, dtype=np.float64),
                                np.asarray(room, dtype=np.float64),
                                max_order)
    if rel_cutoff > 0.0:
        images = prune_images(images, mic, absorption, rel_cutoff, margin=0.0)
    positions, hits = images
    beta = np.sqrt(max(1.0 - absorption, 0.0))
    d = np.linalg.norm(positions - np.asarray(mic, dtype=np.float64), axis=1)
    d = np.maximum(d, 1e-3)
    amp = (beta ** hits / (4.0 * np.pi * d)).astype(np.float32)
    delay = d / c * fs  # fractional samples

    max_delay = float(delay.max())
    rir_len = int(np.ceil(max_delay)) + FDL + 1

    if exact:
        return _scatter_sinc(rir_len, delay, amp, FDL)
    early = delay <= delay.min() + EARLY_WINDOW_S * fs
    rir = _scatter_sinc(rir_len, delay[early], amp[early], FDL)
    if not early.all():
        rir += _scatter_sinc(rir_len, delay[~early], amp[~early], FDL_TAIL)
    return rir


class ShoeBox:
    """Minimal pyroomacoustics-compatible shoebox room."""

    def __init__(self, p, fs: int, max_order: int = 10,
                 absorption: float = 0.3, c: float = 343.0,
                 rel_cutoff: float = 3e-5):
        self.room = np.asarray(p, dtype=np.float64)
        self.fs = fs
        self.max_order = max_order
        self.absorption = absorption
        self.c = c
        self.rel_cutoff = rel_cutoff
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

        mic_center = self.mic_array.mean(axis=0)
        margin = float(np.linalg.norm(self.mic_array - mic_center,
                                      axis=1).max()) + 0.01
        outs = []
        for src, sig in self.sources:
            images = _image_sources(src, self.room, self.max_order)
            images = prune_images(images, mic_center, self.absorption,
                                  self.rel_cutoff, margin=margin)
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
