"""Batched spotforming executor and separation inference — the device sweep.

TPU-native counterpart of `DataParallelSpotModel.shift_and_sep`
(/root/reference/sep/training/JointModel/network.py:27-104) and
`SepNet.infer_sample` (/root/reference/sep/training/SpeakerSeparation/
network.py:492-548).

Design: one jit-compiled program per (batch, T) shape that fuses
gather-roll -> 16-bit-quantize normalize -> network forward -> unnormalize.
Candidate lists are padded to a fixed batch so every sweep reuses the same
executable; the candidate axis is the natural sharding axis for multi-chip
runs (see parallel/).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SPOT_BATCH
from ..models.common import normalize_input, unnormalize_input
from ..ops.shift import roll_channels_batch, roll_zero_fill_batch


class SpotformExecutor:
    """Runs the spotforming net over batches of TDoA candidates."""

    def __init__(self, model, params, batch_size: int = SPOT_BATCH,
                 use_bf16: bool = False):
        self.model = model
        self.batch_size = batch_size
        self.use_bf16 = use_bf16
        self.params = (
            jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
            if use_bf16 else params
        )
        self.calls = 0  # spotforming invocation counter (cost metric)

        @jax.jit
        def _run(params, mix, shifts, window_onehot):
            data = roll_channels_batch(mix, shifts)  # (B, M, T)
            normed, means, stds = normalize_input(data)
            if use_bf16:
                normed = normed.astype(jnp.bfloat16)
            B = shifts.shape[0]
            w = jnp.broadcast_to(window_onehot[None, :], (B, 2)).astype(normed.dtype)
            out = self.model.apply(params, normed, w)  # (B, 1, T)
            out = out.astype(jnp.float32)
            return unnormalize_input(out, means, stds)[:, 0]

        self._run = _run

    def shift_and_sep(self, input_channels: np.ndarray, patch_list,
                      strict: int = 0) -> np.ndarray:
        """input_channels: (M, T); patch_list: list of Patch (or raw offset
        vectors).  Returns (num_patches, T) float32 spotformed outputs."""
        num_patches = len(patch_list)
        M, T = input_channels.shape
        B = self.batch_size

        shifts = np.zeros((num_patches, M), dtype=np.int32)
        for k, p in enumerate(patch_list):
            off = p.sample_offset if hasattr(p, "sample_offset") else p
            shifts[k, 1:] = -np.round(np.asarray(off)).astype(np.int32)

        onehot = jnp.asarray([1.0, 0.0] if strict == 1 else [0.0, 1.0],
                             dtype=jnp.float32)
        mix = jnp.asarray(input_channels, dtype=jnp.float32)
        if self.use_bf16:
            mix = mix  # normalization runs in f32; model consumes bf16 inside

        out = np.zeros((num_patches, T), dtype=np.float32)
        for i in range(0, num_patches, B):
            batch = shifts[i : i + B]
            n = batch.shape[0]
            if n < B:  # pad to the fixed batch to reuse the executable
                batch = np.concatenate(
                    [batch, np.zeros((B - n, M), dtype=np.int32)], axis=0
                )
            res = self._run(self.params, mix, jnp.asarray(batch), onehot)
            out[i : i + n] = np.asarray(res)[:n]
        self.calls += num_patches
        return out


class DelayAndSumExecutor:
    """Classical delay-and-sum spotformer with the same sweep API.

    Not present in the reference (which always uses the neural spot net) —
    provided as a trained-weights-free baseline and for pipeline testing:
    aligning the array to a candidate TDoA and averaging channels gives
    coherent gain only for sources inside the candidate hypercube.
    """

    def __init__(self, batch_size: int = SPOT_BATCH):
        self.batch_size = batch_size
        self.calls = 0

        @jax.jit
        def _run(mix, shifts):
            data = roll_channels_batch(mix, shifts)  # (B, M, T)
            return data.mean(axis=1)

        self._run = _run

    def shift_and_sep(self, input_channels: np.ndarray, patch_list,
                      strict: int = 0) -> np.ndarray:
        num_patches = len(patch_list)
        M, T = input_channels.shape
        B = self.batch_size
        shifts = np.zeros((num_patches, M), dtype=np.int32)
        for k, p in enumerate(patch_list):
            off = p.sample_offset if hasattr(p, "sample_offset") else p
            shifts[k, 1:] = -np.round(np.asarray(off)).astype(np.int32)
        mix = jnp.asarray(input_channels, dtype=jnp.float32)
        out = np.zeros((num_patches, T), dtype=np.float32)
        for i in range(0, num_patches, B):
            batch = shifts[i : i + B]
            n = batch.shape[0]
            if n < B:
                batch = np.concatenate(
                    [batch, np.zeros((B - n, M), dtype=np.int32)], axis=0
                )
            out[i : i + n] = np.asarray(self._run(mix, jnp.asarray(batch)))[:n]
        self.calls += num_patches
        return out


class SeparationInference:
    """Final separation pass: one forward per mixture over all speakers."""

    def __init__(self, model, params, use_bf16: bool = False):
        self.model = model
        self.params = params
        self.max_speakers = model.max_speakers
        n_mics = model.n_mics

        @jax.jit
        def _run(params, mix, shifts, num_speakers):
            S = shifts.shape[0]
            shifted = roll_zero_fill_batch(mix, shifts)  # (S, M, T)
            data = shifted.reshape(1, S * n_mics, -1)
            # Normalize over the *valid* speakers' channels only, matching
            # the reference which packs exactly S_actual * M channels.
            data = jnp.round(data * 2 ** 15) / 2 ** 15
            chan_valid = (
                jnp.arange(S * n_mics) // n_mics < num_speakers
            ).astype(jnp.float32)[None, :]
            n_valid = num_speakers * n_mics
            ref = (data * chan_valid[:, :, None]).sum(1) / n_valid  # (1, T)
            means = ref.mean(1)[:, None, None]
            Tlen = ref.shape[1]
            var = ((ref - means[:, :, 0]) ** 2).sum(1) / (Tlen - 1)
            stds = jnp.sqrt(var)[:, None, None]
            normed = (data - means) / stds
            out = self.model.apply(params, normed,
                                   jnp.asarray([num_speakers]).reshape(1))
            return out * stds + means  # (1, S_pad, T)

        self._run = _run

    def infer(self, input_channels: np.ndarray, patch_list) -> np.ndarray:
        sample_list = [p.sample_offset for p in patch_list]
        return self.infer_sample(input_channels, sample_list)

    def infer_sample(self, input_channels: np.ndarray, sample_list) -> np.ndarray:
        """input_channels: (M, T); sample_list: list of (M-1,) offset vectors.
        Returns (len(sample_list), T)."""
        S_actual = len(sample_list)
        S = self.max_speakers
        M, T = input_channels.shape
        shifts = np.zeros((S, M), dtype=np.int32)
        for k, off in enumerate(sample_list[:S]):
            shifts[k, 1:] = -np.round(np.asarray(off)).astype(np.int32)
        out = self._run(
            self.params,
            jnp.asarray(input_channels, dtype=jnp.float32),
            jnp.asarray(shifts),
            S_actual,
        )
        return np.asarray(out)[0, :S_actual]
