"""Batched spotforming executor and separation inference — the device sweep.

TPU-native counterpart of `DataParallelSpotModel.shift_and_sep`
(/root/reference/sep/training/JointModel/network.py:27-104) and
`SepNet.infer_sample` (/root/reference/sep/training/SpeakerSeparation/
network.py:492-548).

Design goals (driven by measured interconnect costs — D2H on the remote
TPU runtime here is ~6 MB/s with ~0.5 s per-transfer latency):

- ONE device dispatch per sweep: the candidate list is padded to a
  128-multiple bucket and processed inside the program by `lax.map` over
  fixed chunks, so arbitrarily many candidates cost one H2D (shift table)
  and one D2H (power scalars).
- The whole (K, T) output block stays in HBM.  Candidate selection reads
  two scalars per candidate; pairwise clustering decisions use an on-device
  SI-SDR matrix (ops/similarity.py — one MXU matmul); only final cluster
  heads' waveforms are ever copied out, in a single batched transfer.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..constants import SPOT_BATCH
from ..models.common import normalize_input, unnormalize_input
from ..ops.power import candidate_powers
from ..ops.shift import roll_channels_batch, roll_zero_fill_batch
from ..ops.similarity import sisdr_matrix

BUCKET = 128          # candidate-count granularity (one compile per bucket)
# candidates processed per lax.map step (HBM bound).  Env-overridable for
# perf A/Bs: cropped selection sweeps (SPOT_CROP_SECONDS) halve per-chunk
# activation memory, so chunk 256 — which OOMs at full T (23.3 GB vs
# 15.75 GB HBM) — may fit and feed the MXU better there.
# Default 128 measured-optimal on v5e (512-cand fine sweep, full SpotNet,
# T=144000): chunk 32 -> 14.4 s, 64 -> 13.6 s, 128 -> 12.4 s; larger chunks
# amortize per-step overhead and keep the MXU fed.
MAP_CHUNK = int(os.environ.get("SPOT_MAP_CHUNK", "128"))


@jax.jit
def _quantize_rows(x: jnp.ndarray):
    """Per-row int16 quantization: returns (int16 rows, f32 scales)."""
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12) / 32767.0
    q = jnp.clip(jnp.round(x / scale[:, None]), -32768, 32767).astype(jnp.int16)
    return q, scale


def _shift_matrix(patch_list, num_mic: int) -> np.ndarray:
    shifts = np.zeros((len(patch_list), num_mic), dtype=np.int32)
    for k, p in enumerate(patch_list):
        off = p.sample_offset if hasattr(p, "sample_offset") else p
        shifts[k, 1:] = -np.round(np.asarray(off)).astype(np.int32)
    return shifts


class SweepResult:
    """Device-resident sweep outputs with lazy, batched host transfer.

    Construction only dispatches device work; the first access to `powers` /
    `powers_win` / `sisdr_mat` performs one fused D2H.  This lets callers
    overlap host-side work (e.g. patch subdivision) with the device sweep.
    """

    def __init__(self, device_out, n: int, k_pad: int, totals, wins,
                 sim=None):
        self._out = device_out           # (K_pad, T) device array
        self.n = n
        self._k_pad = k_pad
        self._totals = totals            # (K_pad,) device
        self._wins = wins
        self._sim = sim                  # (K_pad, K_pad) device or None
        self._fetched = None

    def _fetch(self):
        if self._fetched is None:
            import jax.numpy as _jnp

            parts = [self._totals, self._wins]
            if self._sim is not None:
                parts.append(self._sim.reshape(-1))
            self._fetched = np.asarray(_jnp.concatenate(parts))
        return self._fetched

    @property
    def powers(self) -> np.ndarray:
        return self._fetch()[: self._k_pad][: self.n]

    @property
    def powers_win(self) -> np.ndarray:
        return self._fetch()[self._k_pad : 2 * self._k_pad][: self.n]

    @property
    def sisdr_mat(self):
        if self._sim is None:
            return None
        return self._fetch()[2 * self._k_pad :].reshape(
            self._k_pad, self._k_pad
        )[: self.n, : self.n]

    def gather(self, indices, quantize: bool = True) -> dict[int, np.ndarray]:
        """Fetch selected centered waveforms in ONE device-to-host copy.

        With `quantize` (default) rows are scaled to int16 on device and
        dequantized here — halving transfer bytes at ~90 dB SNR, far above
        any threshold the clustering/NMS stages operate at."""
        indices = [int(i) for i in indices]
        if not indices:
            return {}
        # pad the index list to a bucket so the gather program is reused
        # across calls with different head counts
        n = len(indices)
        n_pad = ((n + 15) // 16) * 16
        padded = indices + [indices[0]] * (n_pad - n)
        rows = jnp.take(self._out, jnp.asarray(padded), axis=0)
        if quantize:
            q, scales = _quantize_rows(rows)
            qh = np.asarray(q).astype(np.float32)
            sh = np.asarray(scales)
            sel = qh * sh[:, None]
        else:
            sel = np.asarray(rows)
        return {i: sel[k] for k, i in enumerate(indices)}

    def all_waveforms(self) -> np.ndarray:
        return np.asarray(self._out)[: self.n]


class _BatchedSweep:
    """Single-dispatch bucketed sweep driver shared by executors.

    With `mesh` (a jax.sharding.Mesh containing a 'cand' axis), the candidate
    batch axis of every sweep is sharded over that axis via `shard_map`: each
    device runs the `lax.map` chunk loop over its own candidate slice and the
    (K, T) output block lives sharded across the mesh.  The on-device SI-SDR
    similarity matrix is computed on the sharded block inside the same jit
    (XLA inserts the all-gather for the K x K matmul).  Single-device
    behavior (mesh=None) is unchanged; outputs are numerically identical
    (tests/test_parallel.py::test_executor_mesh_equality).
    """

    def __init__(self, batch_size: int = SPOT_BATCH, mesh=None):
        # batch_size kept for API compatibility; the sweep uses MAP_CHUNK.
        self.batch_size = batch_size
        self.mesh = mesh
        self.calls = 0
        self._programs: dict = {}
        # Executors are shared across throughput-mode lanes
        # (pipeline/throughput.py): serialize program builds so two lanes
        # hitting a new bucket size don't trace/compile it twice.
        self._build_lock = __import__("threading").Lock()

    def _chunk_fn(self, mix, shifts_chunk, onehot):
        """(MAP_CHUNK, M) shifts -> (out (MAP_CHUNK, T), total, win)."""
        raise NotImplementedError

    def _n_cand(self) -> int:
        return 1 if self.mesh is None else self.mesh.shape["cand"]

    def _build(self, k_pad: int, with_similarity: bool):
        local_k = k_pad // self._n_cand()
        # Body of MAP_CHUNK-sized lax.map steps (measured-optimal chunk) plus
        # one direct tail call for the remainder — this lets the bucket
        # ladder use 64-candidate granularity above 128 (427 candidates pad
        # to 448, not 512) without dropping to a uniformly smaller, slower
        # chunk size.
        n_body = (local_k // MAP_CHUNK) * MAP_CHUNK
        n_tail = local_k - n_body

        def local_run(mix, shifts_local, onehot, *extra):
            def step(shift_chunk):
                return self._chunk_fn(mix, shift_chunk, onehot, *extra)

            parts = []
            if n_body:
                chunks = shifts_local[:n_body].reshape(-1, MAP_CHUNK,
                                                       shifts_local.shape[-1])
                outs, totals, wins = lax.map(step, chunks)
                T = outs.shape[-1]
                parts.append((outs.reshape(n_body, T),
                              totals.reshape(n_body), wins.reshape(n_body)))
            if n_tail:
                parts.append(step(shifts_local[n_body:]))
            if len(parts) == 1:
                return parts[0]
            return tuple(jnp.concatenate([p[i] for p in parts])
                         for i in range(3))

        if self.mesh is not None:
            from jax.sharding import PartitionSpec as P

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            n_extra = len(self._extra_args())
            local_run = shard_map(
                local_run,
                mesh=self.mesh,
                in_specs=(P(), P("cand", None), P()) + (P(),) * n_extra,
                out_specs=(P("cand", None), P("cand"), P("cand")),
            )

        @jax.jit
        def run(mix, shifts_all, onehot, *extra):
            out, totals, wins = local_run(mix, shifts_all, onehot, *extra)
            if with_similarity:
                sim = sisdr_matrix(out)
                return out, totals, wins, sim
            return out, totals, wins

        return run

    def sweep(self, input_channels: np.ndarray, patch_list, strict: int = 0,
              with_similarity: bool = False) -> SweepResult:
        num_patches = len(patch_list)
        M, T = input_channels.shape
        shifts = _shift_matrix(patch_list, M)
        # Pad the candidate count to a bucket so one compiled program serves
        # all mixtures.  Small buckets {32, 64} matter for the coarse stage:
        # typical SRP pruning yields 10-30 big patches, and padding those to
        # 128 wasted ~2 s of network forwards per mixture.  Above 64 the
        # ladder advances in 64-candidate steps (tail-chunk dispatch in
        # _build) halving the worst-case padding waste of the fine sweep.
        if num_patches <= 32:
            k_pad = 32
        else:
            step = BUCKET if self.mesh is not None else BUCKET // 2
            k_pad = ((num_patches + step - 1) // step) * step
        if k_pad > shifts.shape[0]:
            shifts = np.concatenate(
                [shifts, np.zeros((k_pad - num_patches, M), dtype=np.int32)]
            )
        onehot = jnp.asarray([1.0, 0.0] if strict == 1 else [0.0, 1.0],
                             dtype=jnp.float32)
        mix = jnp.asarray(input_channels, dtype=jnp.float32)

        key = (k_pad, with_similarity)
        if key not in self._programs:
            with self._build_lock:
                if key not in self._programs:
                    self._programs[key] = self._build(k_pad, with_similarity)
        res = self._programs[key](mix, jnp.asarray(shifts), onehot,
                                  *self._extra_args())
        self.calls += num_patches
        if with_similarity:
            out, totals, wins, sim = res
            return SweepResult(out, num_patches, k_pad, totals, wins, sim)
        out, totals, wins = res
        return SweepResult(out, num_patches, k_pad, totals, wins)

    def _extra_args(self):
        return ()

    def shift_and_sep(self, input_channels: np.ndarray, patch_list,
                      strict: int = 0) -> np.ndarray:
        """Full-output compatibility API (mean-subtracted waveforms)."""
        return self.sweep(input_channels, patch_list, strict).all_waveforms()


class SpotformExecutor(_BatchedSweep):
    """Runs the spotforming net over batches of TDoA candidates."""

    def __init__(self, model, params, batch_size: int = SPOT_BATCH,
                 use_bf16: bool = False, mesh=None):
        super().__init__(batch_size, mesh=mesh)
        self.model = model
        self.use_bf16 = use_bf16
        self.params = (
            jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), params)
            if use_bf16 else params
        )

    def _extra_args(self):
        return (self.params,)

    def _chunk_fn(self, mix, shifts, onehot, params):
        data = roll_channels_batch(mix, shifts)  # (B, M, T)
        normed, means, stds = normalize_input(data)
        if self.use_bf16:
            normed = normed.astype(jnp.bfloat16)
        B = shifts.shape[0]
        w = jnp.broadcast_to(onehot[None, :], (B, 2)).astype(normed.dtype)
        out = self.model.apply(params, normed, w)  # (B, 1, T)
        out = out.astype(jnp.float32)
        out = unnormalize_input(out, means, stds)[:, 0]
        return candidate_powers(out)


class DelayAndSumExecutor(_BatchedSweep):
    """Classical delay-and-sum spotformer with the same sweep API.

    Not present in the reference (which always uses the neural spot net) —
    provided as a trained-weights-free baseline and for pipeline testing:
    aligning the array to a candidate TDoA and averaging channels gives
    coherent gain only for sources inside the candidate hypercube.
    """

    def _chunk_fn(self, mix, shifts, onehot):
        data = roll_channels_batch(mix, shifts)
        return candidate_powers(data.mean(axis=1))


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
        Returns (len(sample_list), T).

        The speaker axis is padded to the next `max_speakers` multiple (one
        compiled program per bucket); the network is S-parametric and the
        inter-speaker attention masks padded slots, matching the reference's
        any-S `infer_sample` (SpeakerSeparation/network.py:496-548)."""
        S_actual = len(sample_list)
        S = max(self.max_speakers,
                ((S_actual + self.max_speakers - 1) // self.max_speakers)
                * self.max_speakers)
        M, T = input_channels.shape
        shifts = np.zeros((S, M), dtype=np.int32)
        for k, off in enumerate(sample_list):
            shifts[k, 1:] = -np.round(np.asarray(off)).astype(np.int32)
        out = self._run(
            self.params,
            jnp.asarray(input_channels, dtype=jnp.float32),
            jnp.asarray(shifts),
            S_actual,
        )
        return np.asarray(out)[0, :S_actual]
