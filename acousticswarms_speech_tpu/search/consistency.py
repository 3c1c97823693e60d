"""TDoA-consistency scoring for spotformed candidate heads.

The trained-to-date spot net's dominant failure mode (PERF.md round-4
labeled NMS accounting) is extracting the scene's dominant speaker at
off-target positions; such a head's audio is near-identical to the true
head's (median +10.9 dB pair SI-SDR), so no SI-SDR merge threshold can
separate them — but their *time structure* differs: an extraction that
really comes from its claimed position correlates with each raw mic
channel at lags matching the claimed per-mic TDoA offsets, while a leaked
extraction correlates at the *true* source's TDoAs.

This scores each head by the maximum per-mic-pair deviation between
measured cross-correlation lags and the head patch's claimed
`sample_offset` (same TDoA convention as the GT labels,
pipeline/evaluate.py:94-101: offset[i-1] = delay of mic i minus mic 0 in
samples).  Because the extraction's absolute time base is unknown (the
sweep rolls channels to the claimed alignment), only relative lags
(mic i minus mic 0) are compared, which cancels it exactly.

No reference counterpart: the reference's converged net is position-
selective enough that power-ranked NMS suffices (Mic_Array.py:399-500).
Scores are recorded into power-trace records for offline labeled
validation (scripts/replay_nms.py) before any gating decision is enabled;
the gate itself is env-opt-in (NMS_TDOA_GATE).
"""
from __future__ import annotations

import numpy as np

# Search window for cross-correlation lags, in samples.  Table-scale mic
# spacing bounds true relative TDoAs by ~45 samples at 48 kHz; the
# extraction's alignment offset adds the claimed-position roll, so the
# absolute window is kept generous and relative lags do the comparison.
MAX_LAG = 96


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def measured_lags(head_audio: np.ndarray, mix: np.ndarray,
                  max_lag: int = MAX_LAG) -> np.ndarray:
    """Per-mic cross-correlation argmax lag of `head_audio` (T,) against
    each raw channel of `mix` (M, T): lag_m = argmax_l sum_t y(t) x_m(t+l),
    restricted to |l| <= max_lag.  FFT-based; zero-padding past
    T + 2*max_lag keeps the restricted window wrap-free."""
    y = np.asarray(head_audio, dtype=np.float32)
    x = np.asarray(mix, dtype=np.float32)
    T = min(y.shape[-1], x.shape[-1])
    y, x = y[:T], x[:, :T]
    n = _next_pow2(T + 2 * max_lag + 1)
    Y = np.fft.rfft(y, n)
    X = np.fft.rfft(x, n, axis=-1)
    corr = np.fft.irfft(np.conj(Y)[None, :] * X, n, axis=-1)
    # corr[m, l] = sum_t y(t) x_m(t + l) for l >= 0; negative lags wrap to
    # the tail of the length-n circular buffer.
    window = np.concatenate(
        [corr[:, n - max_lag:], corr[:, : max_lag + 1]], axis=-1
    )
    return window.argmax(axis=-1).astype(np.int64) - max_lag


def head_deviations(head_audios, mix: np.ndarray, claimed_list,
                    max_lag: int = MAX_LAG) -> list[float]:
    """`tdoa_deviation` for many heads of one scene, computing the mix
    channels' FFTs once (the per-scene cost is then one rfft per head)."""
    if not head_audios:
        return []
    x = np.asarray(mix, dtype=np.float32)
    T = min(min(np.asarray(y).shape[-1] for y in head_audios), x.shape[-1])
    n = _next_pow2(T + 2 * max_lag + 1)
    X = np.fft.rfft(x[:, :T], n, axis=-1)
    devs = []
    for y, claimed in zip(head_audios, claimed_list):
        Y = np.fft.rfft(np.asarray(y, dtype=np.float32)[:T], n)
        corr = np.fft.irfft(np.conj(Y)[None, :] * X, n, axis=-1)
        window = np.concatenate(
            [corr[:, n - max_lag:], corr[:, : max_lag + 1]], axis=-1
        )
        lags = window.argmax(axis=-1).astype(np.int64) - max_lag
        rel = lags[1:] - lags[0]
        devs.append(float(np.max(np.abs(
            rel - np.round(np.asarray(claimed, dtype=np.float64))))))
    return devs


def tdoa_deviation(head_audio: np.ndarray, mix: np.ndarray,
                   claimed_pair_offsets: np.ndarray,
                   max_lag: int = MAX_LAG) -> float:
    """Max abs deviation (samples) between measured relative lags
    (mic i minus mic 0) and the head's claimed pair offsets.

    ~0 for an extraction genuinely at the claimed position; roughly the
    TDoA distance between the claimed and true source positions for a
    leaked extraction (compare the mining label threshold of 4.9 samples,
    data/generate_srp_sample.py)."""
    lags = measured_lags(head_audio, mix, max_lag)
    rel = lags[1:] - lags[0]
    claimed = np.asarray(claimed_pair_offsets, dtype=np.float64)
    return float(np.max(np.abs(rel - np.round(claimed))))
