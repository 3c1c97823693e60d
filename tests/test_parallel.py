"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_srp_matches_single_device():
    from acousticswarms_speech_tpu.ops.srp import build_steering_table, srp_phat_map
    from acousticswarms_speech_tpu.ops.stft import dft_bases
    from acousticswarms_speech_tpu.parallel.mesh import make_mesh, shard_srp_map

    rng = np.random.default_rng(0)
    M, T, nfft = 4, 2048, 256
    G = 64
    mic_pos = np.concatenate(
        [rng.uniform(-0.5, 0.5, size=(M, 2)), np.zeros((M, 1))], axis=1
    )
    grids = np.concatenate(
        [rng.uniform(-2, 2, size=(G, 2)), rng.uniform(0.1, 0.5, size=(G, 1))],
        axis=1,
    )
    bins = np.arange(2, 12)
    steer_re, steer_im = build_steering_table(grids, mic_pos, bins, 48000, nfft)
    cos_b, sin_b = dft_bases(nfft, bins)
    signal = rng.normal(size=(M, T)).astype(np.float32)

    single = np.asarray(srp_phat_map(
        jnp.asarray(signal), steer_re, steer_im, jnp.asarray(cos_b),
        jnp.asarray(sin_b), window=1024, nfft=nfft, hop=nfft // 4,
    ))

    mesh = make_mesh(n_data=1, n_cand=8)

    def srp_fn(sig, sre, sim, cb, sb):
        return srp_phat_map(sig, sre, sim, cb, sb, window=1024, nfft=nfft,
                            hop=nfft // 4)

    with mesh:
        sharded = shard_srp_map(mesh, srp_fn)
        multi = np.asarray(sharded(jnp.asarray(signal), steer_re, steer_im,
                                   jnp.asarray(cos_b), jnp.asarray(sin_b)))
    np.testing.assert_allclose(multi, single, rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


@pytest.mark.skipif(
    os.environ.get("RUN_HEAVY") != "1",
    reason="full-size flagship compile takes ~10 min on the 1-core CI CPU; "
    "the driver compile-checks entry() separately",
)
def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[2].shape[0], args[1].shape[1])
    assert np.isfinite(np.asarray(out)).all()
