"""SweepResult: lazy fetch, quantized gather accuracy, bucketing."""
import numpy as np
import jax.numpy as jnp

from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor


def test_sweep_result_lazy_and_gather():
    rng = np.random.default_rng(0)
    mix = rng.normal(size=(4, 4000)).astype(np.float32) * 0.1
    offs = [rng.integers(-30, 30, 3).astype(float) for _ in range(9)]
    ex = DelayAndSumExecutor()
    res = ex.sweep(mix, offs, strict=0, with_similarity=True)

    assert res.n == 9
    assert res.powers.shape == (9,)
    assert res.powers_win.shape == (9,)
    assert res.sisdr_mat.shape == (9, 9)
    # diagonal of the similarity matrix is very high (self-similarity)
    assert np.all(np.diag(res.sisdr_mat) > 50)

    # quantized gather matches exact waveforms to int16 precision
    exact = res.gather([0, 3, 8], quantize=False)
    quant = res.gather([0, 3, 8], quantize=True)
    for i in (0, 3, 8):
        scale = np.abs(exact[i]).max() / 32767.0
        np.testing.assert_allclose(quant[i], exact[i], atol=2 * scale + 1e-9)
        # correlation essentially 1
        c = np.corrcoef(quant[i], exact[i])[0, 1]
        assert c > 0.999999

    # all_waveforms returns exactly n rows
    assert res.all_waveforms().shape == (9, 4000)


def test_sweep_padding_consistency():
    """Padded candidates must not affect real candidates' outputs."""
    rng = np.random.default_rng(1)
    mix = rng.normal(size=(4, 4000)).astype(np.float32) * 0.1
    offs = [rng.integers(-30, 30, 3).astype(float) for _ in range(5)]
    ex = DelayAndSumExecutor()
    r5 = ex.sweep(mix, offs, strict=0)
    r3 = ex.sweep(mix, offs[:3], strict=0)
    np.testing.assert_allclose(r5.powers[:3], r3.powers, rtol=1e-6)
    np.testing.assert_allclose(r5.powers_win[:3], r3.powers_win, rtol=1e-6)


def test_sweep_bucket_ladder():
    """Candidate counts pad to the bucket ladder {32, 64, 128k} and results
    are identical across bucket sizes for the same candidates."""
    from acousticswarms_speech_tpu.search import spotform as sf

    rng = np.random.default_rng(2)
    mix = rng.normal(size=(4, 4000)).astype(np.float32) * 0.1
    offs = [rng.integers(-30, 30, 3).astype(float) for _ in range(70)]

    ex = sf.DelayAndSumExecutor()
    res_small = ex.sweep(mix, offs[:10], strict=0)
    res_mid = ex.sweep(mix, offs[:40], strict=0)
    res_large = ex.sweep(mix, offs, strict=0)
    assert res_small._k_pad == 32
    assert res_mid._k_pad == 64
    assert res_large._k_pad == 128

    # the same candidate evaluated under different bucket sizes agrees
    np.testing.assert_allclose(res_small.powers, res_large.powers[:10],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(res_mid.powers_win, res_large.powers_win[:40],
                               rtol=1e-5, atol=1e-7)


def test_sweep_tail_chunk():
    """Above MAP_CHUNK the ladder advances in 64-candidate steps; the tail
    remainder runs as a direct chunk call and must agree with the body."""
    from acousticswarms_speech_tpu.search import spotform as sf

    rng = np.random.default_rng(3)
    mix = rng.normal(size=(4, 2000)).astype(np.float32) * 0.1
    offs = [rng.integers(-30, 30, 3).astype(float) for _ in range(140)]

    ex = sf.DelayAndSumExecutor()
    res = ex.sweep(mix, offs, strict=0, with_similarity=True)
    assert res._k_pad == 192  # 128-body + 64-tail, not 256
    assert res.n == 140
    # candidates processed by the tail chunk (>=128) match a small-bucket
    # evaluation of the same offsets
    res_tail = ex.sweep(mix, offs[128:], strict=0)
    np.testing.assert_allclose(res.powers[128:], res_tail.powers,
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(res.powers_win[128:], res_tail.powers_win,
                               rtol=1e-5, atol=1e-7)
    assert res.sisdr_mat.shape == (140, 140)
