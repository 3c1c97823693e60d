"""Kernel tests: STFT framing, batched shifts, SRP-PHAT map vs naive numpy."""
import numpy as np
import jax.numpy as jnp

from acousticswarms_speech_tpu.ops.shift import (
    roll_channels,
    roll_channels_batch,
    roll_zero_fill,
)
from acousticswarms_speech_tpu.ops.srp import (
    build_steering_table,
    pair_indices,
    srp_phat_map,
)
from acousticswarms_speech_tpu.ops.stft import (
    dft_bases,
    num_frames,
    stft_analysis,
    stft_bins,
    stft_windowed_bins,
)


def naive_stft(x, nfft, hop):
    n = (len(x) - nfft) // hop + 1
    return np.stack([np.fft.rfft(x[i * hop : i * hop + nfft]) for i in range(n)])


def test_stft_analysis_matches_naive():
    rng = np.random.default_rng(0)
    x = rng.normal(size=4096)
    got = np.asarray(stft_analysis(jnp.asarray(x, dtype=jnp.float32), 1024, 256))
    want = naive_stft(x, 1024, 256)
    assert got.shape == want.shape == (num_frames(4096, 1024, 256), 513)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_stft_bins_matches_rfft():
    rng = np.random.default_rng(5)
    x = rng.normal(size=4096).astype(np.float32)
    bins = np.arange(2, 40)
    cos_b, sin_b = dft_bases(1024, bins)
    re, im = stft_bins(jnp.asarray(x), jnp.asarray(cos_b), jnp.asarray(sin_b),
                       1024, 256)
    want = naive_stft(x, 1024, 256)[:, bins]
    np.testing.assert_allclose(np.asarray(re), want.real, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), want.imag, rtol=2e-3, atol=2e-3)


def test_stft_windowed_layout():
    rng = np.random.default_rng(1)
    sig = rng.normal(size=(3, 10000)).astype(np.float32)
    window, nfft = 4000, 1024
    bins = np.arange(2, 30)
    cos_b, sin_b = dft_bases(nfft, bins)
    re, im = stft_windowed_bins(
        jnp.asarray(sig), jnp.asarray(cos_b), jnp.asarray(sin_b),
        window, window // 2, nfft, nfft // 4,
    )
    # T//step - 1 = 10000//2000 - 1 = 4 windows, all fitting
    assert re.shape[0] == 4 and re.shape[1] == 3
    want = naive_stft(sig[1, 2000:6000], nfft, nfft // 4)[:, bins]
    np.testing.assert_allclose(np.asarray(re)[1, 1], want.real, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im)[1, 1], want.imag, rtol=2e-3, atol=2e-3)


def test_roll_channels_matches_numpy_roll():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 50)).astype(np.float32)
    shifts = np.array([0, 3, -5, 49], dtype=np.int32)
    got = np.asarray(roll_channels(jnp.asarray(x), jnp.asarray(shifts)))
    for c in range(4):
        np.testing.assert_allclose(got[c], np.roll(x[c], shifts[c]), atol=1e-7)


def test_roll_batch_and_zero_fill():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(3, 40)).astype(np.float32)
    shifts = np.array([[0, 2, -2], [1, 0, 5]], dtype=np.int32)
    got = np.asarray(roll_channels_batch(jnp.asarray(x), jnp.asarray(shifts)))
    assert got.shape == (2, 3, 40)
    np.testing.assert_allclose(got[1, 2], np.roll(x[2], 5), atol=1e-7)

    zf = np.asarray(roll_zero_fill(jnp.asarray(x), jnp.asarray(shifts[0])))
    # shift +2: head zeroed; shift -2: tail zeroed
    assert np.all(zf[1, :2] == 0) and np.allclose(zf[1, 2:], x[1, :-2])
    assert np.all(zf[2, -2:] == 0) and np.allclose(zf[2, :-2], x[2, 2:])


def naive_srp_map(signal, grids, mic_pos, freq_bins, fs, nfft, window, c=343.0,
                  tol=1e-8):
    """Direct transliteration of the reference algorithm in pure numpy,
    written from the spec: per-window rectangular STFT, PHAT normalization,
    per-bin covariance, steering contraction, running max from zero."""
    M, T = signal.shape
    hop = nfft // 4
    step = window // 2
    G = grids.shape[0]

    # steering products v_i conj(v_j) with mic z treated as 0
    dx = grids[None, :, 0] - mic_pos[:, None, 0]
    dy = grids[None, :, 1] - mic_pos[:, None, 1]
    dz = grids[None, :, 2]
    dist = np.sqrt(dx ** 2 + dy ** 2 + dz ** 2) / c
    omega = 2 * np.pi * fs * freq_bins / nfft
    mode = np.exp(1j * omega[:, None, None] * dist[None])  # (K, M, G)

    ii, jj = pair_indices(M)
    srp = np.zeros(G)
    frame_number = T // step - 1
    for w in range(frame_number):
        if w * step + window > T:
            break
        seg = signal[:, w * step : w * step + window]
        X = np.stack([naive_stft(ch, nfft, hop).T for ch in seg])  # (M, F, frames)
        aX = np.abs(X)
        aX[aX < tol] = tol
        pX = X / aX
        frames = pX.shape[2]
        result = np.zeros(G)
        for k_idx, k in enumerate(freq_bins):
            CC = pX[:, k, :] @ np.conj(pX[:, k, :]).T / frames  # (M, M)
            for a, b in zip(ii, jj):
                mode_prod = mode[k_idx, a] * np.conj(mode[k_idx, b])  # (G,)
                # Re(x)Re(y) - Im(x)Im(y) == Re(x*y)
                result += (CC[a, b] * mode_prod).real
        result /= len(freq_bins) * len(ii)
        srp = np.maximum(srp, result)
    return srp


def test_srp_map_matches_naive():
    rng = np.random.default_rng(4)
    fs, nfft = 48000, 512
    mic_pos = np.concatenate(
        [rng.uniform(-0.5, 0.5, size=(4, 2)), np.zeros((4, 1))], axis=1
    )
    grids = np.concatenate(
        [rng.uniform(-2, 2, size=(6, 2)), rng.uniform(0.1, 0.5, size=(6, 1))], axis=1
    )
    freq_bins = np.arange(2, 30)
    T, window = 4096, 2048

    t = np.arange(T) / fs
    signal = np.zeros((4, T))
    for m in range(4):
        d = np.linalg.norm(mic_pos[m, :2] - grids[0, :2])
        delay = int(round(d / 343.0 * fs))
        signal[m] = np.roll(rng.normal(size=T), delay) + 0.1 * rng.normal(size=T)

    steer_re, steer_im = build_steering_table(grids, mic_pos, freq_bins, fs, nfft)
    cos_b, sin_b = dft_bases(nfft, freq_bins)
    got = np.asarray(
        srp_phat_map(
            jnp.asarray(signal, dtype=jnp.float32), steer_re, steer_im,
            jnp.asarray(cos_b), jnp.asarray(sin_b), window, nfft, nfft // 4,
        )
    )
    want = naive_srp_map(signal, grids, mic_pos, freq_bins, fs, nfft, window)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_pallas_roll_matches_gather_interpret():
    """The Pallas roll kernel (interpret mode) matches the XLA gather roll
    exactly, including negative and zero shifts."""
    import jax.numpy as jnp

    from acousticswarms_speech_tpu.ops.pallas_shift import (
        pallas_roll_channels_batch,
    )
    from acousticswarms_speech_tpu.ops.shift import roll_channels_batch

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(7, 1024)).astype(np.float32))
    shifts = jnp.asarray(
        np.concatenate([
            rng.integers(-90, 90, (3, 7)),
            np.zeros((1, 7)),
        ]).astype(np.int32)
    )
    got = pallas_roll_channels_batch(x, shifts, interpret=True)
    want = roll_channels_batch(x, shifts)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
