"""MUSIC / TOPS baselines, oracle masks, denoiser."""
import numpy as np
import pytest

from acousticswarms_speech_tpu.constants import FS, SPEED_OF_SOUND
from acousticswarms_speech_tpu.dsp.geometry import build_geometry
from acousticswarms_speech_tpu.dsp.music import music_map_window
from acousticswarms_speech_tpu.dsp.tops import tops_map_window

MIC = np.array([
    [0.0, 0.0, 0.02], [0.5, 0.3, 0.02], [0.5, -0.3, 0.02], [0.7, 0.0, 0.02],
    [0.3, 0.5, 0.02], [0.3, -0.5, 0.02], [0.6, 0.15, 0.02],
])
ROI = [-1.0, 3.0, -2.0, 2.0, 0.1, 0.5]


def _delayed_scene(src, T, seed=0, extra_noise=0.05):
    rng = np.random.default_rng(seed)
    sig = rng.normal(size=T) * 0.3
    mix = np.zeros((7, T))
    for m in range(7):
        d = np.linalg.norm(src - MIC[m])
        delay = int(round(d / SPEED_OF_SOUND * FS))
        mix[m] = np.roll(sig, delay) / (1 + d) + extra_noise * rng.normal(size=T)
    return mix


@pytest.fixture(scope="module")
def geom():
    return build_geometry(MIC, ROI, grid_size=0.15, grid_size_z=0.2)


def test_music_map_localizes_source(geom):
    src = np.array([2.0, 1.0, 0.3])
    mix = _delayed_scene(src, 24000)
    m = music_map_window(mix, geom, np.arange(2, 60), 1024, window=24000)
    assert m.shape == (geom.num_clusters,)
    best = geom.grids[np.argmax(m)]
    assert np.linalg.norm(best[:2] - src[:2]) < 0.4, best


def test_tops_map_runs_and_is_finite(geom):
    src = np.array([2.0, 1.0, 0.3])
    mix = _delayed_scene(src, 24000)
    m = tops_map_window(mix, geom, np.arange(2, 20), 1024, window=24000)
    assert m.shape == (geom.num_clusters,)
    assert np.isfinite(m).all()
    # the true source region should score above the median
    best_idx = np.argsort(-m)[:10]
    dists = np.linalg.norm(geom.grids[best_idx][:, :2] - src[:2], axis=1)
    assert dists.min() < 0.8


def test_oracle_masks_improve_separation():
    from acousticswarms_speech_tpu.utils.metrics import si_sdr
    from acousticswarms_speech_tpu.utils.oracle_masks import do_ibm, do_irm

    rng = np.random.default_rng(0)
    T = 48000
    t = np.arange(T) / FS
    s1 = 0.3 * np.sin(2 * np.pi * 300 * t) * (np.sin(2 * np.pi * 1.0 * t) > 0)
    s2 = 0.3 * np.sin(2 * np.pi * 1200 * t) * (np.sin(2 * np.pi * 1.3 * t) > 0)
    mix = s1 + s2
    for fn in (do_irm, do_ibm):
        est = fn(mix, np.stack([s1, s2]), fs=FS)
        assert est.shape == (2, T)
        for i, s in enumerate([s1, s2]):
            assert si_sdr(est[i], s) > si_sdr(mix, s) + 3


def test_denoise_reduces_noise():
    from acousticswarms_speech_tpu.utils.denoise import denoise
    from acousticswarms_speech_tpu.utils.metrics import si_sdr

    rng = np.random.default_rng(1)
    T = 48000
    t = np.arange(T) / FS
    clean = 0.4 * np.sin(2 * np.pi * 440 * t) * (np.sin(2 * np.pi * 2 * t) > 0)
    noise = 0.05 * rng.normal(size=T)
    noisy = clean + noise
    out = denoise(noisy, 0.05 * rng.normal(size=T), FS)
    assert out.shape == clean.shape
    assert si_sdr(out, clean) > si_sdr(noisy, clean) + 2
