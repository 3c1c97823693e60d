"""Speaker separation network in flax.

Rebuild of /root/reference/sep/training/SpeakerSeparation/network.py:323-553:
per-speaker shifted copies of the M-channel mixture go through a shared U-Net
encoder (speakers folded into the batch axis), a bottleneck alternating an
intra-speaker Conformer over time with inter-speaker attention across the
speaker axis, a shared decoder, and a learned-basis masking head against the
reference channel.

TPU-first change: the reference packs a ragged speaker axis
(`speakers_to_batches`, network.py:236-268).  Here the speaker axis is a
fixed `max_speakers` with a validity mask — masked inter-speaker attention is
numerically identical for the valid speakers, shapes stay static under jit,
and the whole network vmaps over candidates/batches.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .conformer import ConformerLayer
from .modules import (
    Conv1d,
    ConvTranspose1d,
    DecoderBlock,
    EncoderBlock,
    TransformerEncoderLayer,
    decoder_channel_plan,
    encoder_channel_plan,
)


class SepNet(nn.Module):
    n_mics: int = 7
    max_speakers: int = 6
    kernel_size: int = 5
    stride_list: Sequence[int] = (2, 2, 4, 4)
    channels: int = 64
    growth: float = 2.0
    encoder_channels: int = 4096
    encoder_kernel_size: int = 33
    encoder_stride: int = 16
    residual_layers: int = 3
    residual_dilation_factor: int = 2
    num_head: int = 8
    ffw_dim: int = 1024
    bottleneck_layers: int = 3
    bottleneck_ksize: int = 31
    rescale: float = 0.1
    remat: bool = False  # rematerialize U-Net blocks (training memory)

    @property
    def stride_product(self) -> int:
        p = 1
        for s in self.stride_list:
            p *= s
        return p

    @nn.compact
    def __call__(self, mix: jnp.ndarray, num_speakers: jnp.ndarray) -> jnp.ndarray:
        """mix: (B, S*M, T) normalized, S = max_speakers; num_speakers: (B,)
        int.  Returns (B, S, T) with padded speakers zeroed."""
        B, SM, input_length = mix.shape
        S = SM // self.n_mics
        sp = self.stride_product
        T = ((input_length - 1) // sp + 1) * sp
        mix = jnp.pad(mix, ((0, 0), (0, 0), (T - input_length, 0)))

        ref = mix[:, 0:1]  # (B, 1, T) reference channel of speaker 0

        spk_valid = (
            jnp.arange(S)[None, :] < num_speakers[:, None]
        )  # (B, S) bool

        x = mix.reshape(B, S, self.n_mics, T).reshape(B * S, self.n_mics, T)
        x = Conv1d(self.n_mics, self.channels, 1, name="preproc")(x)

        depth = len(self.stride_list)
        enc_plan = encoder_channel_plan(self.channels, self.channels,
                                        self.growth, depth)
        enc_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        dec_cls = nn.remat(DecoderBlock) if self.remat else DecoderBlock
        conf_cls = nn.remat(ConformerLayer) if self.remat else ConformerLayer
        inter_cls = (nn.remat(TransformerEncoderLayer) if self.remat
                     else TransformerEncoderLayer)
        skips = [x]
        for i, (c_in, c_out) in enumerate(enc_plan):
            x = enc_cls(
                c_in, c_out, self.kernel_size, self.stride_list[i],
                self.residual_layers, self.residual_dilation_factor,
                name=f"encoder_{i}",
            )(x)
            skips.append(x)

        C = enc_plan[-1][1]
        Tb = x.shape[-1]

        # Bottleneck: alternate intra-speaker (time) and inter-speaker
        # attention (reference: network.py:270-321).
        for l in range(self.bottleneck_layers):
            # intra: (B*S, C, Tb) -> (B*S, Tb, C) conformer over time
            y = x.transpose(0, 2, 1)
            y = conf_cls(
                C, self.ffw_dim, self.num_head, self.bottleneck_ksize,
                name=f"bottleneck_{l}_intra",
            )(y)
            x = y.transpose(0, 2, 1)

            # inter: attention across the speaker axis at each time step
            y = x.reshape(B, S, C, Tb).transpose(0, 3, 1, 2)  # (B, Tb, S, C)
            y = y.reshape(B * Tb, S, C)
            mask = jnp.repeat(spk_valid, Tb, axis=0)  # (B*Tb, S)
            y = inter_cls(
                C, self.num_head, self.ffw_dim,
                name=f"bottleneck_{l}_inter",
            )(y, mask)
            y = y.reshape(B, Tb, S, C).transpose(0, 2, 3, 1)  # (B, S, C, Tb)
            x = y.reshape(B * S, C, Tb)

        dec_plan = decoder_channel_plan(self.channels, self.channels,
                                        self.growth, depth)
        for i, (c_in, c_out) in enumerate(dec_plan):
            skip = skips[-(i + 1)]
            x = dec_cls(
                c_in, c_out, self.stride_list[depth - 1 - i], self.kernel_size,
                self.residual_layers, self.residual_dilation_factor,
                name=f"decoder_{i}",
            )(x, skip)

        # Latent representation of the reference channel, shared by speakers
        y = Conv1d(1, self.encoder_channels, self.encoder_kernel_size,
                   stride=self.encoder_stride,
                   padding=self.encoder_kernel_size // 2,
                   name="reference_bypass")(ref)
        y = jax.nn.relu(y)  # (B, F, T/16)

        mask = Conv1d(self.channels, self.encoder_channels,
                      self.encoder_kernel_size, stride=self.encoder_stride,
                      padding=self.encoder_kernel_size // 2,
                      name="mask_encoder")(x)
        mask = jax.nn.relu(mask)  # (B*S, F, T/16)

        F, Tl = y.shape[1], y.shape[2]
        masked = y[:, None] * mask.reshape(B, S, F, Tl)  # (B, S, F, Tl)
        masked = masked.reshape(B * S, F, Tl)

        out = ConvTranspose1d(self.encoder_channels, 1,
                              self.encoder_kernel_size,
                              stride=self.encoder_kernel_size // 2,
                              name="output_decoder")(masked)
        out = out.reshape(B, S, -1)[..., 9:-8]
        out = out[..., -input_length:]

        if S < self.max_speakers:
            out = jnp.pad(out, ((0, 0), (0, self.max_speakers - S), (0, 0)))
            spk_valid = jnp.pad(spk_valid, ((0, 0), (0, self.max_speakers - S)))
        # zero padded speakers (reference zero-pads absent speakers,
        # network.py:487-488)
        return out * spk_valid[:, :, None]
