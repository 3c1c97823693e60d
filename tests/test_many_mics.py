"""Many-microphone (10+) configuration support — the BASELINE.json stretch
config.  Everything is parametric in M: geometry (M-1 TDoA pairs), SRP pair
products (M(M-1)/2), models (n_mics channels), executors."""
import numpy as np
import jax
import jax.numpy as jnp

from acousticswarms_speech_tpu.constants import FS, SPEED_OF_SOUND
from acousticswarms_speech_tpu.dsp.geometry import build_geometry
from acousticswarms_speech_tpu.models import SepNet, SpotNet, init_model
from acousticswarms_speech_tpu.ops.srp import SrpMapComputer
from acousticswarms_speech_tpu.search.spotform import (
    DelayAndSumExecutor,
    SeparationInference,
    SpotformExecutor,
)

M = 10
RNG = np.random.default_rng(0)
MIC = np.concatenate([
    np.stack([0.35 + 0.35 * np.cos(np.linspace(0, np.pi, M - 1)),
              0.35 * np.sin(np.linspace(0, np.pi, M - 1))], axis=1),
    np.zeros((M - 1, 1)) + 0.02,
], axis=1)
MIC = np.concatenate([np.array([[0.0, 0.0, 0.02]]), MIC])[:M]
ROI = [-1.5, 2.5, -1.5, 1.5, 0.1, 0.5]


def test_10mic_srp_localizes():
    geom = build_geometry(MIC, ROI, grid_size=0.1)
    assert geom.cluster_offsets.shape[1] == M - 1
    src = np.array([1.8, 0.9, 0.3])
    T = 24000
    sig = RNG.normal(size=T) * 0.3
    mix = np.zeros((M, T))
    for m in range(M):
        d = np.linalg.norm(src - MIC[m])
        mix[m] = np.roll(sig, int(round(d / SPEED_OF_SOUND * FS))) / (1 + d)
    comp = SrpMapComputer(geom.grids, MIC, np.arange(2, 60), FS, 1024)
    m = np.asarray(comp(mix.astype(np.float32), 24000))
    best = geom.grids[np.argmax(m)]
    assert np.linalg.norm(best[:2] - src[:2]) < 0.3, best


def test_10mic_models_and_executors():
    spot = SpotNet(n_mics=M, stride_list=(4, 4), channels=4,
                   encoder_channels=16, residual_layers=1, ffw_dim=8,
                   num_transformer_layers=1, num_head=2)
    params = init_model(spot, jax.random.PRNGKey(0),
                        (jnp.zeros((1, M, 256)), jnp.ones((1, 2))))
    ex = SpotformExecutor(spot, params)
    mix = RNG.normal(size=(M, 2048)).astype(np.float32)
    offsets = [RNG.integers(-20, 20, M - 1).astype(float) for _ in range(5)]
    res = ex.sweep(mix, offsets, strict=1, with_similarity=True)
    assert res.powers.shape == (5,)
    assert res.sisdr_mat.shape == (5, 5)

    sep = SepNet(n_mics=M, max_speakers=2, stride_list=(4, 4), channels=4,
                 encoder_channels=16, residual_layers=1, ffw_dim=8,
                 bottleneck_layers=1, bottleneck_ksize=7, num_head=2)
    sp = init_model(sep, jax.random.PRNGKey(1),
                    (jnp.zeros((1, 2 * M, 256)), jnp.asarray([1])))
    si = SeparationInference(sep, sp)
    out = si.infer_sample(mix, offsets[:2])
    assert out.shape == (2, 2048)
    assert np.isfinite(out).all()
