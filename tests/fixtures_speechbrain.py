"""Hand-built torch mirror of speechbrain's ConformerEncoder.

speechbrain is not installed in this environment, but the reference's
separation net instantiates its intra-speaker blocks as
``speechbrain.lobes.models.transformer.Conformer.ConformerEncoder(
num_layers=1, d_model=C, d_ffn=F, nhead=H, kernel_size=K)`` together with
``speechbrain.nnet.attention.RelPosEncXL``
(/root/reference/sep/training/SpeakerSeparation/network.py:8-9,285-307).
To pin our checkpoint converter against the real state-dict layout, this
module re-implements that encoder in torch with THE SAME submodule names and
parameter shapes, transcribed from the speechbrain sources
(speechbrain/lobes/models/transformer/Conformer.py and
speechbrain/nnet/attention.py, v0.5.x line — the version the reference
depends on):

- ``ConformerEncoderLayer.ffn_module1/2``: nn.Sequential of a raw
  ``nn.LayerNorm``, a ``PositionalwiseFeedForward`` (whose params live under
  ``.ffn.0`` / ``.ffn.3`` — raw ``nn.Linear``s), and a Dropout.
- ``norm1`` / ``norm2`` and the encoder-level ``norm``: speechbrain's
  ``LayerNorm`` *wrapper*, so their params live under an extra ``.norm.``.
- ``mha_layer``: ``RelPosMHAXL`` with ``in_proj_weight`` (3E, E; **no** qkv
  bias), ``out_proj`` (nn.Linear with bias), ``linear_pos`` (nn.Linear, no
  bias), and per-head bias vectors ``pos_bias_u`` / ``pos_bias_v`` (H, E/H).
- ``convolution_module``: raw ``nn.LayerNorm`` -> ``bottleneck`` Sequential
  (1x1 ``nn.Conv1d`` + GLU) -> depthwise ``nn.Conv1d`` -> ``after_conv``
  Sequential (``nn.LayerNorm``, activation, ``nn.Linear``, Dropout).
- forward: x += 0.5*ffn1; skip-attn with pre-norm1; x += conv_module;
  x = norm2(x + 0.5*ffn2); encoder applies the final ``norm`` (eps 1e-6).
- attention: Transformer-XL relative scoring
  ``softmax(((q+u)k^T + rel_shift((q+v)r^T)) / sqrt(head_dim))`` with the
  (2T-1)-row sinusoidal table of ``RelPosEncXL`` (rows ordered rel = T-1
  .. -(T-1); sin is odd in the relative position, cos even).

Assumptions that cannot be validated offline are kept minimal and explicit:
the attention scale (1/sqrt(head_dim)) and the (H, E/H) pos-bias layout.
"""
from __future__ import annotations

import math

import torch
from torch import nn


class SBLayerNormWrapper(nn.Module):
    """speechbrain.nnet.normalization.LayerNorm: wraps torch LN as `.norm`."""

    def __init__(self, size: int, eps: float = 1e-5):
        super().__init__()
        self.norm = nn.LayerNorm(size, eps=eps)

    def forward(self, x):
        return self.norm(x)


class PositionalwiseFeedForward(nn.Module):
    """speechbrain.nnet.attention.PositionalwiseFeedForward."""

    def __init__(self, d_ffn: int, input_size: int, dropout: float = 0.0,
                 activation=nn.SiLU):
        super().__init__()
        self.ffn = nn.Sequential(
            nn.Linear(input_size, d_ffn),
            activation(),
            nn.Dropout(dropout),
            nn.Linear(d_ffn, input_size),
        )

    def forward(self, x):
        return self.ffn(x)


class RelPosEncXL(nn.Module):
    """speechbrain.nnet.attention.RelPosEncXL: (1, 2T-1, E) sinusoidal table
    over relative positions T-1 .. -(T-1)."""

    def __init__(self, emb_dim: int):
        super().__init__()
        self.emb_dim = emb_dim

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        T = x.size(1)
        pos = torch.arange(T - 1, -T, -1, dtype=torch.float64).unsqueeze(-1)
        inv_freq = torch.exp(
            torch.arange(0, self.emb_dim, 2, dtype=torch.float64)
            * -(math.log(10000.0) / self.emb_dim)
        )
        pe = torch.zeros(2 * T - 1, self.emb_dim, dtype=torch.float64)
        pe[:, 0::2] = torch.sin(pos * inv_freq)
        pe[:, 1::2] = torch.cos(pos * inv_freq)
        return pe.to(x.dtype).unsqueeze(0)


class RelPosMHAXL(nn.Module):
    """speechbrain.nnet.attention.RelPosMHAXL (self-attention path)."""

    def __init__(self, embed_dim: int, num_heads: int):
        super().__init__()
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.head_dim = embed_dim // num_heads
        self.in_proj_weight = nn.Parameter(torch.empty(3 * embed_dim,
                                                       embed_dim))
        self.out_proj = nn.Linear(embed_dim, embed_dim)
        self.linear_pos = nn.Linear(embed_dim, embed_dim, bias=False)
        self.pos_bias_u = nn.Parameter(torch.empty(num_heads, self.head_dim))
        self.pos_bias_v = nn.Parameter(torch.empty(num_heads, self.head_dim))
        nn.init.xavier_uniform_(self.in_proj_weight)
        nn.init.xavier_uniform_(self.pos_bias_u)
        nn.init.xavier_uniform_(self.pos_bias_v)

    def forward(self, x: torch.Tensor, pos_embs: torch.Tensor):
        B, T, E = x.shape
        H, hd = self.num_heads, self.head_dim
        qkv = torch.nn.functional.linear(x, self.in_proj_weight)
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(B, T, H, hd)
        k = k.view(B, T, H, hd).permute(0, 2, 1, 3)
        v = v.view(B, T, H, hd).permute(0, 2, 1, 3)
        # (1, 2T-1, E) -> (2T-1, H, hd)
        r = self.linear_pos(pos_embs)[0].view(2 * T - 1, H, hd)

        q_u = (q + self.pos_bias_u[None, None]).permute(0, 2, 1, 3)
        q_v = (q + self.pos_bias_v[None, None]).permute(0, 2, 1, 3)
        ac = q_u @ k.transpose(-1, -2)                     # (B, H, T, T)
        bd_full = torch.einsum("bhqd,rhd->bhqr", q_v, r)   # (B, H, T, 2T-1)
        # rel_shift: row i keeps columns (T-1) - (i - j), j = 0..T-1
        i = torch.arange(T).unsqueeze(1)
        j = torch.arange(T).unsqueeze(0)
        bd = bd_full[:, :, i, (T - 1) - (i - j)]
        attn = torch.softmax((ac + bd) / math.sqrt(hd), dim=-1)
        out = (attn @ v).permute(0, 2, 1, 3).reshape(B, T, E)
        return self.out_proj(out)


class ConvolutionModule(nn.Module):
    """speechbrain Conformer ConvolutionModule (non-causal, dilation 1)."""

    def __init__(self, input_size: int, kernel_size: int,
                 activation=nn.SiLU, dropout: float = 0.0):
        super().__init__()
        self.layer_norm = nn.LayerNorm(input_size)
        self.bottleneck = nn.Sequential(
            nn.Conv1d(input_size, 2 * input_size, kernel_size=1),
            nn.GLU(dim=1),
        )
        self.conv = nn.Conv1d(input_size, input_size, kernel_size,
                              padding=(kernel_size - 1) // 2,
                              groups=input_size)
        self.after_conv = nn.Sequential(
            nn.LayerNorm(input_size),
            activation(),
            nn.Linear(input_size, input_size),
            nn.Dropout(dropout),
        )

    def forward(self, x):
        out = self.layer_norm(x)
        out = out.transpose(1, 2)
        out = self.bottleneck(out)
        out = self.conv(out)
        out = out.transpose(1, 2)
        return self.after_conv(out)


class ConformerEncoderLayer(nn.Module):
    def __init__(self, d_model: int, d_ffn: int, nhead: int,
                 kernel_size: int, activation=nn.SiLU, dropout: float = 0.0):
        super().__init__()
        self.mha_layer = RelPosMHAXL(d_model, nhead)
        self.convolution_module = ConvolutionModule(d_model, kernel_size,
                                                    activation, dropout)
        self.ffn_module1 = nn.Sequential(
            nn.LayerNorm(d_model),
            PositionalwiseFeedForward(d_ffn, d_model, dropout, activation),
            nn.Dropout(dropout),
        )
        self.ffn_module2 = nn.Sequential(
            nn.LayerNorm(d_model),
            PositionalwiseFeedForward(d_ffn, d_model, dropout, activation),
            nn.Dropout(dropout),
        )
        self.norm1 = SBLayerNormWrapper(d_model)
        self.norm2 = SBLayerNormWrapper(d_model)

    def forward(self, x, pos_embs):
        x = x + 0.5 * self.ffn_module1(x)
        skip = x
        x = self.norm1(x)
        x = self.mha_layer(x, pos_embs) + skip
        x = x + self.convolution_module(x)
        return self.norm2(x + 0.5 * self.ffn_module2(x))


class ConformerEncoder(nn.Module):
    """speechbrain ConformerEncoder: layers + final norm (eps 1e-6)."""

    def __init__(self, num_layers: int, d_model: int, d_ffn: int,
                 nhead: int, kernel_size: int):
        super().__init__()
        self.layers = nn.ModuleList([
            ConformerEncoderLayer(d_model, d_ffn, nhead, kernel_size)
            for _ in range(num_layers)
        ])
        self.norm = SBLayerNormWrapper(d_model, eps=1e-6)

    def forward(self, x, pos_embs):
        for layer in self.layers:
            x = layer(x, pos_embs)
        return self.norm(x)
