"""Sequence-parallel SRP: window-range slabs per device, pmax merge."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_time_sharded_srp_matches_single_device():
    from acousticswarms_speech_tpu.ops.srp import build_steering_table, srp_phat_map
    from acousticswarms_speech_tpu.ops.stft import dft_bases
    from acousticswarms_speech_tpu.parallel.mesh import make_mesh, srp_time_sharded

    rng = np.random.default_rng(0)
    M, nfft = 4, 256
    window = 1024
    step = window // 2
    D = 4  # time slabs
    # Build a signal long enough for D disjoint window-ranges of 2 windows
    # each: slab length = window + step (2 windows with 50% hop).
    slab_T = window + step
    T = D * slab_T
    signal = rng.normal(size=(M, T)).astype(np.float32)

    mic_pos = np.concatenate(
        [rng.uniform(-0.5, 0.5, size=(M, 2)), np.zeros((M, 1))], axis=1
    )
    grids = np.concatenate(
        [rng.uniform(-2, 2, size=(16, 2)), rng.uniform(0.1, 0.5, size=(16, 1))],
        axis=1,
    )
    bins = np.arange(2, 12)
    steer_re, steer_im = build_steering_table(grids, mic_pos, bins, 48000, nfft)
    cos_b, sin_b = dft_bases(nfft, bins)
    cos_b, sin_b = jnp.asarray(cos_b), jnp.asarray(sin_b)

    # single-device reference: max over per-slab maps (the slab split changes
    # which windows exist, so compare against per-slab computation)
    slabs = signal.reshape(M, D, slab_T).transpose(1, 0, 2)  # (D, M, slab_T)
    want = np.max([
        np.asarray(srp_phat_map(jnp.asarray(s), steer_re, steer_im, cos_b,
                                sin_b, window, nfft, nfft // 4))
        for s in slabs
    ], axis=0)

    mesh = make_mesh(n_data=1, n_cand=4, devices=jax.devices()[:4])
    fn = srp_time_sharded(mesh)(window, nfft, nfft // 4)
    with mesh:
        got = np.asarray(fn(jnp.asarray(slabs), steer_re, steer_im,
                            cos_b, sin_b))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
