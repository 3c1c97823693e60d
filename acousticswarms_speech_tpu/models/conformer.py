"""Conformer encoder layer with Transformer-XL relative-position attention.

Rebuild of the intra-speaker attention block the reference takes from
speechbrain (`ConformerEncoder` + `RelPosEncXL`,
/root/reference/sep/training/SpeakerSeparation/network.py:8-9,285-307),
implemented from the published Conformer architecture (Gulati et al. 2020)
and Transformer-XL relative attention (Dai et al. 2019):

    x = x + 0.5 * FFN(LN(x))
    x = x + RelPosMHSA(LN(x))
    x = x + ConvModule(LN(x))        # pointwise->GLU->depthwise(k)->LN->SiLU->pointwise
    x = LN(x + 0.5 * FFN(LN(x)))

Attention score: (q + u)·k^T + rel_shift((q + v)·r^T), with a learned
linear projection of sinusoidal relative-position encodings and per-head
content/position bias vectors u, v.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import Conv1d, Dense, LayerNorm, _kaiming_uniform, glu


def rel_pos_encoding(T: int, d_model: int, dtype=np.float32) -> np.ndarray:
    """Sinusoidal encodings for relative positions T-1 .. -(T-1).

    Returns (2T-1, d_model); row r encodes relative position (T-1 - r)."""
    pos = np.arange(T - 1, -T, -1, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                 * -(math.log(10000.0) / d_model))
    pe = np.zeros((2 * T - 1, d_model))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return pe.astype(dtype)


class RelPosMHAXL(nn.Module):
    """Multi-head self-attention with Transformer-XL relative positions.

    Input (B, T, E); the (2T-1, E) positional table is built on the fly from
    the static sequence length.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        B, T, _ = x.shape

        qkv_w = self.param("in_proj_weight", _kaiming_uniform(E), (3 * E, E))
        qkv_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        pos_w = self.param("linear_pos_weight", _kaiming_uniform(E), (E, E))
        bias_u = self.param("pos_bias_u", nn.initializers.zeros, (H, hd))
        bias_v = self.param("pos_bias_v", nn.initializers.zeros, (H, hd))

        x = x.astype(qkv_w.dtype)
        qkv = x @ qkv_w.T + qkv_b
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)

        pe = jnp.asarray(rel_pos_encoding(T, E), dtype=qkv_w.dtype)  # (2T-1, E)
        r = (pe @ pos_w.T).reshape(2 * T - 1, H, hd)     # (2T-1, H, hd)

        q_u = (q + bias_u[None, None]).transpose(0, 2, 1, 3)  # (B, H, T, hd)
        q_v = (q + bias_v[None, None]).transpose(0, 2, 1, 3)

        ac = jnp.einsum("bhqd,bhkd->bhqk", q_u, k,
                        preferred_element_type=jnp.float32)
        bd_full = jnp.einsum("bhqd,rhd->bhqr", q_v, r,
                             preferred_element_type=jnp.float32)  # (B,H,T,2T-1)
        # Relative-position realignment bd[..., i, j] = bd_full[..., i,
        # (T-1) - i + j] via the pad+reshape "skew" trick (Transformer-XL) —
        # an advanced-index gather here materializes a (T, T, B, H) gather
        # result whose tiny minor dims tile-pad ~25x on TPU (9.6 GB for the
        # separation bottleneck at T=1125) and the axon backend has no good
        # gather lowering; the skew is pure pad/reshape/slice.
        bd_pad = jnp.pad(bd_full, ((0, 0), (0, 0), (0, 0), (1, 0)))
        bd = bd_pad.reshape(B, H, T * 2 * T)[:, :, T:] \
            .reshape(B, H, T, 2 * T - 1)[:, :, :, :T]
        scores = (ac + bd) / math.sqrt(hd)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)
        return Dense(E, E, name="out_proj")(out)


class ConformerFFN(nn.Module):
    d_model: int
    d_ffn: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Dense(self.d_model, self.d_ffn, name="linear1")(x)
        x = jax.nn.silu(x)
        return Dense(self.d_ffn, self.d_model, name="linear2")(x)


class ConformerConvModule(nn.Module):
    d_model: int
    kernel_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, C)."""
        x = Conv1d(self.d_model, 2 * self.d_model, 1, name="pointwise1")(
            x.transpose(0, 2, 1)
        )
        x = glu(x, axis=1)
        pad = (self.kernel_size - 1) // 2
        x = Conv1d(self.d_model, self.d_model, self.kernel_size, padding=pad,
                   groups=self.d_model, name="depthwise")(x)
        x = x.transpose(0, 2, 1)
        x = LayerNorm(self.d_model, name="norm")(x)
        x = jax.nn.silu(x)
        x = Conv1d(self.d_model, self.d_model, 1, name="pointwise2")(
            x.transpose(0, 2, 1)
        )
        return x.transpose(0, 2, 1)


class ConformerLayer(nn.Module):
    """One speechbrain-style `ConformerEncoder(num_layers=1)` block.

    The reference instantiates each intra-speaker block as a one-layer
    speechbrain ConformerEncoder (SpeakerSeparation/network.py:290), which
    applies BOTH the layer's own post-FFN norm (`norm2` there, `norm_final`
    here) and the encoder-level final norm (`ConformerEncoder.norm`,
    eps 1e-6; `norm_enc` here) — two consecutive LayerNorms with distinct
    affine parameters.  `encoder_norm=False` gives the bare layer.
    """

    d_model: int
    d_ffn: int
    num_heads: int
    kernel_size: int
    encoder_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, C)."""
        x = x + 0.5 * ConformerFFN(self.d_model, self.d_ffn, name="ffn1")(
            LayerNorm(self.d_model, name="norm_ffn1")(x)
        )
        x = x + RelPosMHAXL(self.d_model, self.num_heads, name="mhsa")(
            LayerNorm(self.d_model, name="norm_mhsa")(x)
        )
        x = x + ConformerConvModule(self.d_model, self.kernel_size, name="conv")(
            LayerNorm(self.d_model, name="norm_conv")(x)
        )
        x = x + 0.5 * ConformerFFN(self.d_model, self.d_ffn, name="ffn2")(
            LayerNorm(self.d_model, name="norm_ffn2")(x)
        )
        x = LayerNorm(self.d_model, name="norm_final")(x)
        if self.encoder_norm:
            x = LayerNorm(self.d_model, eps=1e-6, name="norm_enc")(x)
        return x
