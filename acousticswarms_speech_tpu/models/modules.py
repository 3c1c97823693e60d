"""Flax building blocks with PyTorch-compatible numerics and param layout.

These mirror the layer semantics used by the reference networks
(/root/reference/sep/training/SpeakerLocalization/network.py and
SpeakerSeparation/network.py) so that (a) released PyTorch checkpoints can be
mapped 1:1 onto our param trees (see models/convert.py) and (b) unit tests
can verify each block against torch.nn on CPU.

Param naming convention: torch names ('weight', 'bias', 'in_proj_weight', …)
with torch layouts; layers transpose internally as needed.  All __call__s
take channel-first (B, C, T) activations like the reference.
"""
from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _kaiming_uniform(fan_in: float):
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound * math.sqrt(3.0),
                                  bound * math.sqrt(3.0))

    return init


def _uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """torch.nn.Conv1d-compatible conv on (B, C, T)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.in_channels // self.groups * self.kernel_size
        w = self.param(
            "weight",
            _kaiming_uniform(fan_in),
            (self.out_channels, self.in_channels // self.groups, self.kernel_size),
        )
        x = x.astype(w.dtype)  # heal f32/bf16 promotion from preceding ops
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(self.stride,),
            padding=[(self.padding, self.padding)],
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=self.groups,
        )
        if self.use_bias:
            b = self.param("bias", _uniform_bound(1.0 / math.sqrt(fan_in)),
                           (self.out_channels,))
            y = y + b[None, :, None]
        return y


class ConvTranspose1d(nn.Module):
    """torch.nn.ConvTranspose1d-compatible transposed conv on (B, C, T)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.out_channels * self.kernel_size
        w = self.param(
            "weight",
            _kaiming_uniform(fan_in),
            (self.in_channels, self.out_channels, self.kernel_size),
        )
        x = x.astype(w.dtype)
        # conv_transpose(x, w) == conv(lhs_dilate(x, s), flip(w)^T)
        w_flip = jnp.flip(w, axis=2).transpose(1, 0, 2)  # (O, I, K)
        pad = self.kernel_size - 1 - self.padding
        y = lax.conv_general_dilated(
            x,
            w_flip,
            window_strides=(1,),
            padding=[(pad, pad)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        if self.use_bias:
            b = self.param("bias", _uniform_bound(1.0 / math.sqrt(fan_in)),
                           (self.out_channels,))
            y = y + b[None, :, None]
        return y


class Dense(nn.Module):
    """torch.nn.Linear-compatible dense layer on (..., F)."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", _kaiming_uniform(self.in_features),
                       (self.out_features, self.in_features))
        x = x.astype(w.dtype)
        y = x @ w.T
        if self.use_bias:
            b = self.param("bias", _uniform_bound(1.0 / math.sqrt(self.in_features)),
                           (self.out_features,))
            y = y + b
        return y


class GroupNorm(nn.Module):
    """torch.nn.GroupNorm-compatible norm on (B, C, T)."""

    num_groups: int
    num_channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, C, T = x.shape
        g = self.num_groups
        w = self.param("weight", nn.initializers.ones, (C,))
        b = self.param("bias", nn.initializers.zeros, (C,))
        dtype = x.dtype
        xg = x.astype(jnp.float32).reshape(B, g, C // g * T)
        mean = xg.mean(axis=2, keepdims=True)
        var = xg.var(axis=2, keepdims=True)
        xg = (xg - mean) * lax.rsqrt(var + self.eps)
        x = xg.reshape(B, C, T)
        out = x * w[None, :, None].astype(jnp.float32) \
            + b[None, :, None].astype(jnp.float32)
        return out.astype(dtype)


class LayerNorm(nn.Module):
    """torch.nn.LayerNorm-compatible norm over the last axis."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = xf.var(axis=-1, keepdims=True)
        out = (xf - mean) * lax.rsqrt(var + self.eps) * w.astype(jnp.float32) \
            + b.astype(jnp.float32)
        return out.astype(dtype)


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis of (B, C, T) activations, computed
    in-place in the channel-first layout.

    Numerically equivalent to `transpose -> LayerNorm -> transpose` (the
    reference applies torch LayerNorm to (B, T, C) views,
    SpeakerLocalization/network.py:50-68) but avoids materializing two full
    transposed copies of the activation per residual layer — at the first
    U-Net level that is 2 x (C x T) extra HBM round trips per candidate.
    Param tree ("weight"/"bias" of shape (C,) under the module name) is
    identical to LayerNorm, so checkpoints are interchangeable."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=1, keepdims=True)
        var = xf.var(axis=1, keepdims=True)
        out = (xf - mean) * lax.rsqrt(var + self.eps) \
            * w.astype(jnp.float32)[None, :, None] \
            + b.astype(jnp.float32)[None, :, None]
        return out.astype(dtype)


def glu(x: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """torch.nn.GLU: split in two along `axis`, gate second half."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible self-attention.

    Input (B, T, E); params mirror torch: in_proj_weight (3E, E),
    in_proj_bias (3E,), out_proj.{weight,bias}.
    """

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_mask=None) -> jnp.ndarray:
        """key_mask: optional (B, T) bool; False keys are excluded (matching
        torch's key_padding_mask semantics, used for the fixed-size speaker
        axis replacing the reference's ragged packing)."""
        E, H = self.embed_dim, self.num_heads
        hd = E // H
        in_w = self.param("in_proj_weight", _kaiming_uniform(E), (3 * E, E))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        qkv = x @ in_w.T + in_b  # (B, T, 3E)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        B, T, _ = x.shape
        q = q.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, H, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) / math.sqrt(hd)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, E)

        out = Dense(E, E, name="out_proj")(out)
        return out


class TransformerEncoderLayer(nn.Module):
    """torch.nn.TransformerEncoderLayer-compatible (post-norm, ReLU).

    Input (B, T, E).  Matches torch defaults: norm_first=False,
    activation='relu', dropout inactive at inference.
    """

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_mask=None) -> jnp.ndarray:
        x = x + MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
            x, key_mask
        )
        x = LayerNorm(self.d_model, name="norm1")(x)
        y = Dense(self.d_model, self.dim_feedforward, name="linear1")(x)
        y = jax.nn.relu(y)
        y = Dense(self.dim_feedforward, self.d_model, name="linear2")(y)
        x = x + y
        x = LayerNorm(self.d_model, name="norm2")(x)
        return x


class TransformerEncoder(nn.Module):
    """Stack of TransformerEncoderLayer, input (B, T, E)."""

    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, key_mask=None) -> jnp.ndarray:
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.d_model, self.nhead, self.dim_feedforward,
                name=f"layers_{i}",
            )(x, key_mask)
        return x


# ---------------------------------------------------------------------------
# U-Net blocks shared by both reference networks
# ---------------------------------------------------------------------------


class DilatedResidualLayer(nn.Module):
    """Conv -> ReLU(+residual) -> LayerNorm over channels
    (reference: SpeakerLocalization/network.py:50-68)."""

    nchannels: int
    ksize: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = (self.dilation * (self.ksize - 1) + 1) // 2
        y = Conv1d(self.nchannels, self.nchannels, self.ksize,
                   dilation=self.dilation, padding=pad, name="conv")(x)
        y = jax.nn.relu(y) + x
        # LayerNorm over the channel axis, computed without transposing
        return ChannelLayerNorm(self.nchannels, name="norm")(y)


class DilatedResidualSequence(nn.Module):
    nchannels: int
    ksize: int
    nlayers: int = 2
    dilation_factor: int = 2

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.nlayers):
            x = DilatedResidualLayer(
                self.nchannels, self.ksize, self.dilation_factor ** i,
                name=f"seq_{i}",
            )(x)
        return x


class EncoderBlock(nn.Module):
    """Residual stack -> (optional window-embedding gate) -> strided conv ->
    GroupNorm -> GLU (reference: SpeakerLocalization/network.py:84-113 and
    SpeakerSeparation/network.py:86-111)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int
    residual_layers: int
    residual_dilation_factor: int
    use_window_embedding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, window_embedding=None) -> jnp.ndarray:
        x = DilatedResidualSequence(
            self.in_channels, self.kernel_size, self.residual_layers,
            self.residual_dilation_factor, name="res",
        )(x)
        if self.use_window_embedding:
            gate = Conv1d(2, self.in_channels, 1, name="embed1")(
                window_embedding[:, :, None]
            )
            x = gate * x
        x = Conv1d(self.in_channels, 2 * self.out_channels, self.kernel_size,
                   stride=self.stride, padding=self.kernel_size // 2,
                   name="conv1")(x)
        x = GroupNorm(2, 2 * self.out_channels, name="norm1")(x)
        return glu(x, axis=1)


class DecoderBlock(nn.Module):
    """skip-add -> ConvTranspose upsample -> (optional gate) -> GroupNorm ->
    GLU -> residual stack (reference: SpeakerLocalization/network.py:167-200,
    SpeakerSeparation/network.py:170-198)."""

    in_channels: int
    out_channels: int
    stride: int
    kernel_size: int
    residual_layers: int
    residual_dilation_factor: int
    use_window_embedding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray,
                 window_embedding=None) -> jnp.ndarray:
        x = x + skip
        x = ConvTranspose1d(self.in_channels, 2 * self.out_channels,
                            self.stride, stride=self.stride,
                            name="upsample_conv")(x)
        if self.use_window_embedding:
            gate = Conv1d(2, 2 * self.out_channels, 1, name="embed1")(
                window_embedding[:, :, None]
            )
            x = gate * x
        x = GroupNorm(2, 2 * self.out_channels, name="norm1")(x)
        x = glu(x, axis=1)
        x = DilatedResidualSequence(
            self.out_channels, self.kernel_size, self.residual_layers,
            self.residual_dilation_factor, name="res",
        )(x)
        return x


def encoder_channel_plan(in_channels: int, channels: int, growth: float,
                         depth: int) -> list[tuple[int, int]]:
    """(in, out) channel pairs per encoder block, mirroring the reference's
    channel growth loop (SpeakerLocalization/network.py:129-144)."""
    plan = []
    c_in, c_out = in_channels, channels
    for _ in range(depth):
        plan.append((c_in, c_out))
        c_in = c_out
        c_out = int(growth * c_out)
    return plan


def decoder_channel_plan(in_channels: int, channels: int, growth: float,
                         depth: int) -> list[tuple[int, int]]:
    """(in, out) pairs for decoder blocks, in application (top-down) order —
    the reference builds them bottom-up and inserts at the front
    (SpeakerLocalization/network.py:216-227)."""
    plan = []
    c_in, c_out = in_channels, channels
    for _ in range(depth):
        plan.append((c_out, c_in))  # DecoderBlock(channels -> out_channels)
        c_in = c_out
        c_out = int(growth * c_out)
    return plan[::-1]
