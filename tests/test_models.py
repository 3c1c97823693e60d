"""Model-level tests: shapes, rescale init, speaker-mask invariance."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from acousticswarms_speech_tpu.models import (
    SepNet,
    SpotNet,
    create_model,
    init_model,
    param_count,
    rescale_params,
)

SMALL_SPOT = dict(
    n_mics=4, kernel_size=7, stride_list=(2, 2, 4), channels=8, growth=2,
    encoder_channels=32, encoder_kernel_size=33, encoder_stride=16,
    residual_layers=1, residual_dilation_factor=7, num_head=2, ffw_dim=16,
    num_transformer_layers=1,
)

SMALL_SEP = dict(
    n_mics=4, max_speakers=3, kernel_size=5, stride_list=(2, 2, 4), channels=8,
    growth=2, encoder_channels=32, encoder_kernel_size=33, encoder_stride=16,
    residual_layers=1, residual_dilation_factor=2, num_head=2, ffw_dim=16,
    bottleneck_layers=1, bottleneck_ksize=7,
)


def test_spotnet_output_shape():
    model = SpotNet(**SMALL_SPOT)
    B, M, T = 2, 4, 1000  # deliberately not a stride multiple
    x = jnp.zeros((B, M, T))
    w = jnp.tile(jnp.array([[1.0, 0.0]]), (B, 1))
    params = model.init(jax.random.PRNGKey(0), x, w)
    y = model.apply(params, x, w)
    assert y.shape == (B, 1, T)
    assert np.isfinite(np.asarray(y)).all()


def test_spotnet_window_embedding_changes_output():
    model = SpotNet(**SMALL_SPOT)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 4, 512)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1, 2)))
    y_strict = model.apply(params, x, jnp.asarray([[1.0, 0.0]]))
    y_relaxed = model.apply(params, x, jnp.asarray([[0.0, 1.0]]))
    assert not np.allclose(np.asarray(y_strict), np.asarray(y_relaxed))


def test_sepnet_output_shape_and_padded_speakers_zero():
    model = SepNet(**SMALL_SEP)
    B, S, M, T = 2, 3, 4, 700
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(B, S * M, T)).astype(np.float32))
    n_spk = jnp.asarray([2, 3])
    params = model.init(jax.random.PRNGKey(0), x, n_spk)
    y = model.apply(params, x, n_spk)
    assert y.shape == (B, 3, T)
    # Padded speaker slots are exactly zero
    assert np.all(np.asarray(y)[0, 2] == 0)
    assert np.any(np.asarray(y)[1, 2] != 0)


def test_sepnet_masked_attention_matches_packed_semantics():
    """Valid-speaker outputs must be unaffected by what sits in padded
    speaker slots — the fixed-size-axis equivalent of the reference's ragged
    packing."""
    model = SepNet(**SMALL_SEP)
    B, S, M, T = 1, 3, 4, 448
    rng = np.random.default_rng(2)
    base = rng.normal(size=(B, S * M, T)).astype(np.float32)
    n_spk = jnp.asarray([2])
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(base), n_spk)

    y1 = model.apply(params, jnp.asarray(base), n_spk)
    junk = base.copy()
    junk[:, 2 * M :] = rng.normal(size=(B, M, T)).astype(np.float32) * 10
    y2 = model.apply(params, jnp.asarray(junk), n_spk)
    np.testing.assert_allclose(
        np.asarray(y1)[:, :2], np.asarray(y2)[:, :2], rtol=5e-4, atol=5e-5
    )


def test_rescale_params_changes_conv_std():
    model = SpotNet(**SMALL_SPOT)
    x = jnp.zeros((1, 4, 256))
    w = jnp.ones((1, 2))
    raw = model.init(jax.random.PRNGKey(0), x, w)
    scaled = rescale_params(raw, reference=0.1)
    pre = raw["params"]["preproc"]["weight"]
    post = scaled["params"]["preproc"]["weight"]
    expected = np.asarray(pre) / np.sqrt(np.std(np.asarray(pre)) / 0.1)
    np.testing.assert_allclose(np.asarray(post), expected, rtol=1e-5)
    # non-conv params untouched
    np.testing.assert_array_equal(
        np.asarray(raw["params"]["bottleneck"]["layers_0"]["norm1"]["weight"]),
        np.asarray(scaled["params"]["bottleneck"]["layers_0"]["norm1"]["weight"]),
    )


def test_factory_resolves_reference_configs():
    spot = create_model("SpeakerLocalization", {
        "n_mics": 7, "channels": 64, "growth": 2, "encoder_channels": 2048,
        "stride_list": [2, 2, 4, 4, 4], "kernel_size": 7,
        "residual_dilation_factor": 7,
    })
    assert isinstance(spot, SpotNet) and spot.stride_product == 256
    sep = create_model("SpeakerSeparation", {
        "n_mics": 7, "max_speakers": 5, "channels": 64, "growth": 2,
        "encoder_channels": 4096,
    })
    assert isinstance(sep, SepNet) and sep.stride_product == 64


def test_param_count_full_size_spotnet():
    """The full-size spot net should land in the same parameter regime as the
    reference (tens of millions)."""
    model = create_model("SpeakerLocalization", {
        "n_mics": 7, "channels": 64, "growth": 2, "encoder_channels": 2048,
        "stride_list": [2, 2, 4, 4, 4], "kernel_size": 7,
        "residual_dilation_factor": 7,
    })
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 7, 256)), jnp.ones((1, 2))
    )
    n = param_count(params)
    assert 10e6 < n < 100e6, n


def test_relpos_skew_matches_gather():
    """The pad+reshape rel-pos skew in RelPosMHAXL must equal the reference
    advanced-index gather bd_full[:, :, i, (T-1)-(i-j)] (the gather form
    tile-pads 25x on TPU and is why the skew exists)."""
    import numpy as np

    B, H, T = 2, 3, 7
    rng = np.random.default_rng(0)
    bd_full = rng.normal(size=(B, H, T, 2 * T - 1)).astype(np.float32)

    i = np.arange(T)[:, None]
    j = np.arange(T)[None, :]
    ref = bd_full[:, :, i, (T - 1) - (i - j)]

    bd_pad = np.pad(bd_full, ((0, 0), (0, 0), (0, 0), (1, 0)))
    skew = bd_pad.reshape(B, H, T * 2 * T)[:, :, T:] \
        .reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
    np.testing.assert_array_equal(skew, ref)
