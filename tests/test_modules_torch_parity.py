"""Parity tests: flax building blocks vs torch.nn on identical weights.

These pin the numerics needed for reference-checkpoint compatibility
(conv/transposed-conv layouts, GroupNorm/LayerNorm conventions, GLU,
post-norm TransformerEncoderLayer, input normalization with 16-bit
quantization and Bessel-corrected std).
"""
import numpy as np
import jax.numpy as jnp
import torch

from acousticswarms_speech_tpu.models.common import normalize_input, unnormalize_input
from acousticswarms_speech_tpu.models.modules import (
    Conv1d,
    ConvTranspose1d,
    Dense,
    GroupNorm,
    LayerNorm,
    MultiheadAttention,
    TransformerEncoderLayer,
    glu,
)

torch.manual_seed(0)
RTOL, ATOL = 2e-4, 2e-5


def _run(module, variables, *args):
    return np.asarray(module.apply(variables, *map(jnp.asarray, args)))


def test_conv1d_matches_torch():
    tc = torch.nn.Conv1d(6, 10, 7, stride=2, padding=3, dilation=1)
    x = torch.randn(2, 6, 64)
    want = tc(x).detach().numpy()
    m = Conv1d(6, 10, 7, stride=2, padding=3)
    vars_ = {"params": {"weight": jnp.asarray(tc.weight.detach().numpy()),
                        "bias": jnp.asarray(tc.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_dilated_conv1d_matches_torch():
    tc = torch.nn.Conv1d(4, 4, 7, dilation=7, padding=(7 * 6 + 1) // 2)
    x = torch.randn(2, 4, 100)
    want = tc(x).detach().numpy()
    m = Conv1d(4, 4, 7, dilation=7, padding=(7 * 6 + 1) // 2)
    vars_ = {"params": {"weight": jnp.asarray(tc.weight.detach().numpy()),
                        "bias": jnp.asarray(tc.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_grouped_conv1d_matches_torch():
    tc = torch.nn.Conv1d(8, 8, 31, padding=15, groups=8)
    x = torch.randn(2, 8, 50)
    want = tc(x).detach().numpy()
    m = Conv1d(8, 8, 31, padding=15, groups=8)
    vars_ = {"params": {"weight": jnp.asarray(tc.weight.detach().numpy()),
                        "bias": jnp.asarray(tc.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv_transpose1d_matches_torch():
    # Matches the output decoder: kernel 33, stride 16
    tc = torch.nn.ConvTranspose1d(12, 1, 33, stride=16)
    x = torch.randn(2, 12, 9)
    want = tc(x).detach().numpy()
    m = ConvTranspose1d(12, 1, 33, stride=16)
    vars_ = {"params": {"weight": jnp.asarray(tc.weight.detach().numpy()),
                        "bias": jnp.asarray(tc.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_conv_transpose_stride_equals_kernel():
    # Matches the decoder upsampler: kernel == stride
    tc = torch.nn.ConvTranspose1d(6, 8, 4, stride=4)
    x = torch.randn(1, 6, 17)
    want = tc(x).detach().numpy()
    m = ConvTranspose1d(6, 8, 4, stride=4)
    vars_ = {"params": {"weight": jnp.asarray(tc.weight.detach().numpy()),
                        "bias": jnp.asarray(tc.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_group_norm_matches_torch():
    tg = torch.nn.GroupNorm(2, 8)
    with torch.no_grad():
        tg.weight.uniform_(0.5, 1.5)
        tg.bias.uniform_(-0.5, 0.5)
    x = torch.randn(3, 8, 20)
    want = tg(x).detach().numpy()
    m = GroupNorm(2, 8)
    vars_ = {"params": {"weight": jnp.asarray(tg.weight.detach().numpy()),
                        "bias": jnp.asarray(tg.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_layer_norm_matches_torch():
    tl = torch.nn.LayerNorm(16)
    with torch.no_grad():
        tl.weight.uniform_(0.5, 1.5)
        tl.bias.uniform_(-0.5, 0.5)
    x = torch.randn(3, 7, 16)
    want = tl(x).detach().numpy()
    m = LayerNorm(16)
    vars_ = {"params": {"weight": jnp.asarray(tl.weight.detach().numpy()),
                        "bias": jnp.asarray(tl.bias.detach().numpy())}}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_glu_matches_torch():
    x = torch.randn(2, 10, 5)
    want = torch.nn.functional.glu(x, dim=1).numpy()
    got = np.asarray(glu(jnp.asarray(x.numpy()), axis=1))
    np.testing.assert_allclose(got, want, rtol=RTOL, atol=ATOL)


def test_multihead_attention_matches_torch():
    E, H = 16, 4
    ta = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = torch.randn(2, 9, E)
    want = ta(x, x, x, need_weights=False)[0].detach().numpy()
    m = MultiheadAttention(E, H)
    vars_ = {"params": {
        "in_proj_weight": jnp.asarray(ta.in_proj_weight.detach().numpy()),
        "in_proj_bias": jnp.asarray(ta.in_proj_bias.detach().numpy()),
        "out_proj": {
            "weight": jnp.asarray(ta.out_proj.weight.detach().numpy()),
            "bias": jnp.asarray(ta.out_proj.bias.detach().numpy()),
        },
    }}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_transformer_encoder_layer_matches_torch():
    E, H, F = 16, 4, 32
    tl = torch.nn.TransformerEncoderLayer(E, H, dim_feedforward=F,
                                          batch_first=True)
    tl.eval()
    x = torch.randn(2, 9, E)
    with torch.no_grad():
        want = tl(x).numpy()
    m = TransformerEncoderLayer(E, H, F)
    sd = tl.state_dict()
    vars_ = {"params": {
        "self_attn": {
            "in_proj_weight": jnp.asarray(sd["self_attn.in_proj_weight"].numpy()),
            "in_proj_bias": jnp.asarray(sd["self_attn.in_proj_bias"].numpy()),
            "out_proj": {
                "weight": jnp.asarray(sd["self_attn.out_proj.weight"].numpy()),
                "bias": jnp.asarray(sd["self_attn.out_proj.bias"].numpy()),
            },
        },
        "linear1": {"weight": jnp.asarray(sd["linear1.weight"].numpy()),
                     "bias": jnp.asarray(sd["linear1.bias"].numpy())},
        "linear2": {"weight": jnp.asarray(sd["linear2.weight"].numpy()),
                     "bias": jnp.asarray(sd["linear2.bias"].numpy())},
        "norm1": {"weight": jnp.asarray(sd["norm1.weight"].numpy()),
                   "bias": jnp.asarray(sd["norm1.bias"].numpy())},
        "norm2": {"weight": jnp.asarray(sd["norm2.weight"].numpy()),
                   "bias": jnp.asarray(sd["norm2.bias"].numpy())},
    }}
    got = _run(m, vars_, x.numpy())
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_normalize_input_matches_reference_semantics():
    rng = np.random.default_rng(0)
    data = rng.normal(scale=0.1, size=(3, 7, 1000)).astype(np.float32)

    # torch transliteration of the reference normalize_input
    td = torch.tensor(data)
    tq = (td * 2 ** 15).round() / 2 ** 15
    ref = tq.mean(1)
    means = ref.mean(1).unsqueeze(1).unsqueeze(2)
    stds = ref.std(1).unsqueeze(1).unsqueeze(2)
    want = ((tq - means) / stds).numpy()

    got, m, s = normalize_input(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m)[:, 0, 0], means[:, 0, 0].numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s)[:, 0, 0], stds[:, 0, 0].numpy(),
                               rtol=1e-4, atol=1e-6)
    back = unnormalize_input(got, m, s)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tq), rtol=1e-4,
                               atol=1e-6)
