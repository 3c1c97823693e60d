"""Conformer component tests: rel-pos attention vs a brute-force reference."""
import numpy as np
import jax
import jax.numpy as jnp

from acousticswarms_speech_tpu.models.conformer import (
    ConformerLayer,
    RelPosMHAXL,
    rel_pos_encoding,
)


def test_rel_pos_encoding_structure():
    pe = rel_pos_encoding(5, 8)
    assert pe.shape == (9, 8)
    # row T-1 = relative position 0: sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-7)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-7)


def test_relpos_attention_matches_bruteforce():
    E, H, T, B = 8, 2, 6, 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, E)).astype(np.float32)

    mod = RelPosMHAXL(E, H)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))

    p = params["params"]
    qkv_w = np.asarray(p["in_proj_weight"])
    qkv_b = np.asarray(p["in_proj_bias"])
    pos_w = np.asarray(p["linear_pos_weight"])
    u = np.asarray(p["pos_bias_u"])
    v_bias = np.asarray(p["pos_bias_v"])
    ow = np.asarray(p["out_proj"]["weight"])
    ob = np.asarray(p["out_proj"]["bias"])

    hd = E // H
    pe = rel_pos_encoding(T, E)
    r = (pe @ pos_w.T).reshape(2 * T - 1, H, hd)

    want = np.zeros_like(x)
    for b in range(B):
        qkv = x[b] @ qkv_w.T + qkv_b
        q, k, v = np.split(qkv, 3, axis=-1)
        out_heads = []
        for h in range(H):
            qh = q[:, h * hd:(h + 1) * hd]
            kh = k[:, h * hd:(h + 1) * hd]
            vh = v[:, h * hd:(h + 1) * hd]
            scores = np.zeros((T, T))
            for i in range(T):
                for j in range(T):
                    content = (qh[i] + u[h]) @ kh[j]
                    # relative position i - j -> table row (T-1) - (i - j)
                    pos_term = (qh[i] + v_bias[h]) @ r[(T - 1) - (i - j), h]
                    scores[i, j] = (content + pos_term) / np.sqrt(hd)
            attn = np.exp(scores - scores.max(axis=1, keepdims=True))
            attn /= attn.sum(axis=1, keepdims=True)
            out_heads.append(attn @ vh)
        merged = np.concatenate(out_heads, axis=-1)
        want[b] = merged @ ow.T + ob

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_conformer_layer_shapes_and_residual():
    layer = ConformerLayer(d_model=8, d_ffn=16, num_heads=2, kernel_size=5)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 8))
                    .astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x)
    y = layer.apply(params, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()
    # not an identity map
    assert not np.allclose(np.asarray(y), np.asarray(x))
