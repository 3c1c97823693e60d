"""Batched spotforming executor and separation inference — the device sweep.

TPU-native counterpart of `DataParallelSpotModel.shift_and_sep`
(/root/reference/sep/training/JointModel/network.py:27-104) and
`SepNet.infer_sample` (/root/reference/sep/training/SpeakerSeparation/
network.py:492-548).

Design: one jit-compiled program per (batch, T) shape that fuses
gather-roll -> 16-bit-quantize normalize -> network forward -> unnormalize ->
mean-subtract -> power reductions.  Candidate selection consumes only two
scalars per candidate; full waveforms stay device-resident and only the
(few) threshold-passing candidates are ever copied to the host.  Candidate
lists are padded to a fixed batch so every sweep reuses the same executable;
the candidate axis is the natural sharding axis for multi-chip runs
(see parallel/mesh.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import SPOT_BATCH
from ..models.common import normalize_input, unnormalize_input
from ..ops.power import candidate_powers
from ..ops.shift import roll_channels_batch, roll_zero_fill_batch


def _shift_matrix(patch_list, num_mic: int) -> np.ndarray:
    shifts = np.zeros((len(patch_list), num_mic), dtype=np.int32)
    for k, p in enumerate(patch_list):
        off = p.sample_offset if hasattr(p, "sample_offset") else p
        shifts[k, 1:] = -np.round(np.asarray(off)).astype(np.int32)
    return shifts


class SweepResult:
    """Device-resident sweep outputs with lazy host transfer."""

    def __init__(self, chunks: list, batch_size: int, n: int,
                 powers: np.ndarray, powers_win: np.ndarray):
        self._chunks = chunks            # list of (B, T) device arrays
        self._batch = batch_size
        self.n = n
        self.powers = powers             # (n,) mean-subtracted total power
        self.powers_win = powers_win     # (n,) max sliding-window RMS

    def gather(self, indices) -> dict[int, np.ndarray]:
        """Fetch the centered waveforms of selected candidates."""
        out = {}
        for i in indices:
            c, r = divmod(int(i), self._batch)
            out[int(i)] = np.asarray(self._chunks[c][r])
        return out

    def all_waveforms(self) -> np.ndarray:
        full = np.concatenate([np.asarray(c) for c in self._chunks], axis=0)
        return full[: self.n]


class _BatchedSweep:
    """Shared batching/padding driver for spotform-style executors."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self.calls = 0

    def _run_batch(self, mix, shifts, onehot):
        raise NotImplementedError

    def sweep(self, input_channels: np.ndarray, patch_list,
              strict: int = 0) -> SweepResult:
        num_patches = len(patch_list)
        M, T = input_channels.shape
        B = self.batch_size
        shifts = _shift_matrix(patch_list, M)
        onehot = jnp.asarray([1.0, 0.0] if strict == 1 else [0.0, 1.0],
                             dtype=jnp.float32)
        mix = jnp.asarray(input_channels, dtype=jnp.float32)

        chunks, totals, wins = [], [], []
        for i in range(0, num_patches, B):
            batch = shifts[i : i + B]
            n = batch.shape[0]
            if n < B:
                batch = np.concatenate(
                    [batch, np.zeros((B - n, M), dtype=np.int32)], axis=0
                )
            centered, total, win = self._run_batch(mix, jnp.asarray(batch),
                                                   onehot)
            chunks.append(centered)
            totals.append(np.asarray(total)[:n])
            wins.append(np.asarray(win)[:n])
        self.calls += num_patches
        return SweepResult(
            chunks, B, num_patches,
            np.concatenate(totals) if totals else np.zeros(0),
            np.concatenate(wins) if wins else np.zeros(0),
        )

    def shift_and_sep(self, input_channels: np.ndarray, patch_list,
                      strict: int = 0) -> np.ndarray:
        """Full-output compatibility API (mean-subtracted waveforms)."""
        return self.sweep(input_channels, patch_list, strict).all_waveforms()


class SpotformExecutor(_BatchedSweep):
    """Runs the spotforming net over batches of TDoA candidates."""

    def __init__(self, model, params, batch_size: int = SPOT_BATCH,
                 use_bf16: bool = False):
        super().__init__(batch_size)
        self.model = model
        self.use_bf16 = use_bf16
        self.params = (
            jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
            if use_bf16 else params
        )

        @jax.jit
        def _run(params, mix, shifts, window_onehot):
            data = roll_channels_batch(mix, shifts)  # (B, M, T)
            normed, means, stds = normalize_input(data)
            if use_bf16:
                normed = normed.astype(jnp.bfloat16)
            B = shifts.shape[0]
            w = jnp.broadcast_to(window_onehot[None, :], (B, 2)).astype(
                normed.dtype
            )
            out = self.model.apply(params, normed, w)  # (B, 1, T)
            out = out.astype(jnp.float32)
            out = unnormalize_input(out, means, stds)[:, 0]
            return candidate_powers(out)

        self._jitted = _run

    def _run_batch(self, mix, shifts, onehot):
        return self._jitted(self.params, mix, shifts, onehot)


class DelayAndSumExecutor(_BatchedSweep):
    """Classical delay-and-sum spotformer with the same sweep API.

    Not present in the reference (which always uses the neural spot net) —
    provided as a trained-weights-free baseline and for pipeline testing:
    aligning the array to a candidate TDoA and averaging channels gives
    coherent gain only for sources inside the candidate hypercube.
    """

    def __init__(self, batch_size: int = SPOT_BATCH):
        super().__init__(batch_size)

        @jax.jit
        def _run(mix, shifts, onehot):
            data = roll_channels_batch(mix, shifts)
            return candidate_powers(data.mean(axis=1))

        self._jitted = _run

    def _run_batch(self, mix, shifts, onehot):
        return self._jitted(mix, shifts, onehot)


class SeparationInference:
    """Final separation pass: one forward per mixture over all speakers."""

    def __init__(self, model, params, use_bf16: bool = False):
        self.model = model
        self.use_bf16 = use_bf16
        self.params = (
            jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
            if use_bf16 else params
        )
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
            if use_bf16:
                normed = normed.astype(jnp.bfloat16)
            out = self.model.apply(params, normed,
                                   jnp.asarray([num_speakers]).reshape(1))
            out = out.astype(jnp.float32)
            return out * stds + means  # (1, S_pad, T)

        self._run = _run

    def infer(self, input_channels: np.ndarray, patch_list) -> np.ndarray:
        sample_list = [p.sample_offset for p in patch_list]
        return self.infer_sample(input_channels, sample_list)

    def infer_sample(self, input_channels: np.ndarray, sample_list) -> np.ndarray:
        """input_channels: (M, T); sample_list: list of (M-1,) offset vectors.
        Returns (min(len(sample_list), max_speakers), T)."""
        S_actual = min(len(sample_list), self.max_speakers)
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
