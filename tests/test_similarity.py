"""On-device pairwise SI-SDR matrix vs host scalar implementation."""
import numpy as np
import jax.numpy as jnp

from acousticswarms_speech_tpu.ops.similarity import sisdr_matrix
from acousticswarms_speech_tpu.utils.metrics import si_sdr


def test_sisdr_matrix_matches_host():
    rng = np.random.default_rng(0)
    base = rng.normal(size=20000)
    x = np.stack([
        base,
        base + 0.3 * rng.normal(size=20000),
        rng.normal(size=20000),
        -0.5 * base,
    ])
    x = x - x.mean(axis=1, keepdims=True)  # sweep outputs are centered
    got = np.asarray(sisdr_matrix(jnp.asarray(x, dtype=jnp.float32)))
    for i in range(4):
        for j in range(4):
            if i == j:
                continue
            want = si_sdr(x[i], x[j])
            assert abs(got[i, j] - want) < 0.15, (i, j, got[i, j], want)
    # structure checks: correlated pair similar, independent pair dissimilar
    assert got[1, 0] > -1
    assert got[2, 0] < -10
