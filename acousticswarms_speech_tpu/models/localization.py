"""Spotforming (SpeakerLocalization) network in flax.

Capability- and checkpoint-compatible rebuild of
/root/reference/sep/training/SpeakerLocalization/network.py:268-405:
a 1-D U-Net (5 encoder/decoder blocks with dilated residual stacks and GLU),
a 2-layer Transformer bottleneck at T/256, a 2-dim one-hot window embedding
multiplied into every encoder/decoder block, and a learned-basis masking head
(mask x reference-channel latent -> transposed-conv decode, trim [9:-8]).

The network is purely functional; the batched spotforming sweep vmaps/jits
its apply over the candidate axis (see search/spotform.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import (
    Conv1d,
    ConvTranspose1d,
    DecoderBlock,
    EncoderBlock,
    TransformerEncoder,
    decoder_channel_plan,
    encoder_channel_plan,
)


class SpotNet(nn.Module):
    n_mics: int = 7
    kernel_size: int = 7
    stride_list: Sequence[int] = (2, 2, 4, 4, 4)
    channels: int = 64
    growth: float = 2.0
    encoder_channels: int = 2048
    encoder_kernel_size: int = 33
    encoder_stride: int = 16
    rescale: float = 0.1
    residual_layers: int = 3
    residual_dilation_factor: int = 7
    num_head: int = 8
    ffw_dim: int = 1024
    num_transformer_layers: int = 2
    remat: bool = False  # rematerialize U-Net blocks (training memory)

    @property
    def stride_product(self) -> int:
        p = 1
        for s in self.stride_list:
            p *= s
        return p

    @nn.compact
    def __call__(self, mix: jnp.ndarray, window_embedding: jnp.ndarray) -> jnp.ndarray:
        """mix: (B, M, T) normalized input; window_embedding: (B, 2).
        Returns (B, 1, T)."""
        input_length = mix.shape[-1]
        sp = self.stride_product
        T = ((input_length - 1) // sp + 1) * sp
        mix = jnp.pad(mix, ((0, 0), (0, 0), (T - input_length, 0)))

        ref = mix[:, 0:1]  # (B, 1, T)

        x = Conv1d(self.n_mics, self.channels, 1, name="preproc")(mix)

        depth = len(self.stride_list)
        enc_plan = encoder_channel_plan(self.channels, self.channels,
                                        self.growth, depth)
        enc_cls = nn.remat(EncoderBlock) if self.remat else EncoderBlock
        dec_cls = nn.remat(DecoderBlock) if self.remat else DecoderBlock
        skips = [x]
        for i, (c_in, c_out) in enumerate(enc_plan):
            x = enc_cls(
                c_in, c_out, self.kernel_size, self.stride_list[i],
                self.residual_layers, self.residual_dilation_factor,
                use_window_embedding=True, name=f"encoder_{i}",
            )(x, window_embedding)
            skips.append(x)

        bottleneck_channels = enc_plan[-1][1]
        # (B, C, T') -> (B, T', C) for attention, back after
        y = x.transpose(0, 2, 1)
        y = TransformerEncoder(
            bottleneck_channels, self.num_head, self.ffw_dim,
            self.num_transformer_layers, name="bottleneck",
        )(y)
        x = y.transpose(0, 2, 1)

        dec_plan = decoder_channel_plan(self.channels, self.channels,
                                        self.growth, depth)
        for i, (c_in, c_out) in enumerate(dec_plan):
            skip = skips[-(i + 1)]
            x = dec_cls(
                c_in, c_out, self.stride_list[depth - 1 - i], self.kernel_size,
                self.residual_layers, self.residual_dilation_factor,
                use_window_embedding=True, name=f"decoder_{i}",
            )(x, skip, window_embedding)

        # Latent representation of the reference channel
        y = Conv1d(1, self.encoder_channels, self.encoder_kernel_size,
                   stride=self.encoder_stride,
                   padding=self.encoder_kernel_size // 2,
                   name="reference_bypass")(ref)
        y = jax.nn.relu(y)

        mask = Conv1d(self.channels, self.encoder_channels,
                      self.encoder_kernel_size, stride=self.encoder_stride,
                      padding=self.encoder_kernel_size // 2,
                      name="mask_encoder")(x)
        mask = jax.nn.relu(mask)

        out = ConvTranspose1d(self.encoder_channels, 1,
                              self.encoder_kernel_size,
                              stride=self.encoder_kernel_size // 2,
                              name="output_decoder")(y * mask)
        out = out[..., 9:-8]  # trim transposed-conv edge samples
        return out[..., -input_length:]
