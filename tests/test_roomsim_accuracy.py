"""Hybrid fast RIR rendering vs the exact full-sinc image-source model.

The dataset generator renders RIRs with (a) amplitude pruning of inaudible
images (< -80 dB rel.), (b) full 81-tap fractional-delay sincs for the
first 8 ms after the direct path (the TDoA-carrying early part), and
(c) 11-tap sincs for the diffuse tail.  These tests pin the accuracy
contract of that approximation against the exact rendering.
"""
import numpy as np
import pytest

from acousticswarms_speech_tpu.data.roomsim import (
    _image_sources,
    compute_rir,
    inverse_sabine,
    prune_images,
)

ROOM = np.array([6.5, 7.0, 2.3])
SRC = np.array([2.0, 3.0, 1.5])
MIC = np.array([1.0, 1.0, 0.02])
FS = 48000


@pytest.fixture(scope="module")
def rir_pair():
    a, order = inverse_sabine(0.4, ROOM)
    images = _image_sources(SRC, ROOM, order)
    pruned = prune_images(images, MIC, a, 3e-5, margin=0.0)
    fast = compute_rir(SRC, MIC, ROOM, a, order, FS, images=pruned)
    exact = compute_rir(SRC, MIC, ROOM, a, order, FS, images=images,
                        exact=True)
    n = min(len(fast), len(exact))
    return fast[:n], exact[:n]


def test_early_window_is_exact(rir_pair):
    fast, exact = rir_pair
    d0 = int(np.floor(np.linalg.norm(SRC - MIC) / 343.0 * FS))
    w = d0 + int(0.008 * FS)
    assert np.linalg.norm(fast[:w] - exact[:w]) <= \
        1e-6 * np.linalg.norm(exact[:w])


def test_energy_envelope_matches(rir_pair):
    fast, exact = rir_pair
    n = len(fast)
    bins = np.arange(0, n, 480)  # 10 ms
    e1 = np.add.reduceat(fast**2, bins)
    e2 = np.add.reduceat(exact**2, bins)
    lev = 10 * np.log10(e2 / e2.max() + 1e-30)
    sel = lev > -40.0
    dev = np.abs(10 * np.log10((e1[sel] + 1e-30) / (e2[sel] + 1e-30)))
    assert dev.max() < 3.0, f"envelope deviates {dev.max():.2f} dB"
    assert 0.85 < (fast**2).sum() / (exact**2).sum() < 1.05


def test_pruning_keeps_loud_images():
    a, order = inverse_sabine(0.3, ROOM)
    images = _image_sources(SRC, ROOM, order)
    pruned = prune_images(images, MIC, a, 3e-5, margin=0.5)
    assert pruned[0].shape[0] < images[0].shape[0]
    # the direct path (hits == 0) always survives
    assert (pruned[1] == 0).sum() == 1
