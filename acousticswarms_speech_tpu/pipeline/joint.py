"""End-to-end joint localization + separation pipeline.

Rebuild of /root/reference/sep/training/JointModel/network.py (`JointModel`):
localize-by-separation (SRP pruning -> coarse spotform -> fine spotform ->
NMS) followed by separate-by-localization (one separation forward over the
final speaker TDoAs).  Stage wall-times are recorded in `self.times[0..4]`
with the same ordering as the reference (SRP, coarse, fine, clustering,
separation); geometry setup is cached per mic-configuration string exactly
like JointModel.setup (:125-137).
"""
from __future__ import annotations

import os
import time

import numpy as np

from ..constants import FS, SPOT_BATCH
from ..models import SepNet, SpotNet
from ..search.spotform import SeparationInference, SpotformExecutor
from .mic_array import MicArray


class JointPipeline:
    def __init__(self, spot_model: SpotNet, spot_params, sep_model: SepNet,
                 sep_params, spot_batch_size: int = SPOT_BATCH,
                 use_bf16: bool = False, mesh=None,
                 sweep_crop_seconds: float | None = None):
        """`mesh`: optional jax.sharding.Mesh with a 'cand' axis — the coarse
        and fine spotforming sweeps (the workload's scaling axis) shard their
        candidate batches over it; see search/spotform.py:_BatchedSweep.

        `sweep_crop_seconds` (or env SPOT_CROP_SECONDS): when > 0, the coarse
        and fine selection sweeps run on the loudest `sweep_crop_seconds`
        window of the mixture instead of full T — the sweep is HBM-bound
        (PERF.md round-3 roofline), so bytes, not FLOPs, set its time, and
        selection only needs power/similarity statistics.  Cluster heads get
        one extra full-T strict sweep for NMS decisions and output audio.
        Default 1.5 s since round 5: quality-neutral on the traced 12-scene
        probe (commit 1109f73) and re-validated on the round-5 wide eval;
        SPOT_CROP_SECONDS=0 restores full-T selection sweeps."""
        self.spot_model = SpotformExecutor(spot_model, spot_params,
                                           batch_size=spot_batch_size,
                                           use_bf16=use_bf16, mesh=mesh)
        self.sep_model = SeparationInference(sep_model, sep_params,
                                             use_bf16=use_bf16)
        env_crop = os.environ.get("SPOT_CROP_SECONDS")
        self.sweep_crop_seconds = (
            float(env_crop) if env_crop is not None
            else (1.5 if sweep_crop_seconds is None else sweep_crop_seconds))
        self.times = [0.0] * 5
        self.previous_config: str | None = None
        self.mic_processor: MicArray | None = None

    @classmethod
    def from_experiments(cls, spot_exp_dir: str, sep_exp_dir: str, **kwargs):
        """Load both checkpoints from experiment directories ('best' mode),
        mirroring JointModel.__init__ (network.py:106-123)."""
        from ..training.experiment import load_model_from_exp

        spot_model, spot_params = load_model_from_exp(spot_exp_dir, mode="best")
        sep_model, sep_params = load_model_from_exp(sep_exp_dir, mode="best")
        return cls(spot_model, spot_params, sep_model, sep_params, **kwargs)

    def setup(self, mic_positions: np.ndarray, speaker_range,
              cache_dir: str | None = None, grid_size: float = 0.05) -> None:
        """Initialize (or reuse) the search geometry for a mic configuration."""
        current_config = "~".join(
            f"{x:.05f}" for x in np.asarray(mic_positions).flatten()
        ) + "|" + "~".join(f"{x:.05f}" for x in speaker_range)
        if current_config == self.previous_config:
            return
        self.mic_processor = MicArray(mic_positions, spk_range=speaker_range,
                                      cache_dir=cache_dir, grid_size=grid_size)
        self.previous_config = current_config

    def forward(self, mix_data: np.ndarray, profile_dir: str | None = None):
        """mix_data: (M, T).  Returns (patches, audio_loc, audio, srp_drop,
        stage1_drop, spot_times) like JointModel.forward (:142-149).

        `profile_dir` captures a jax.profiler trace of the whole forward
        (first-class tracing replacing the reference's wall-clock prints,
        SURVEY.md §5.1)."""
        if profile_dir is not None:
            import jax

            with jax.profiler.trace(profile_dir):
                return self._forward(mix_data)
        return self._forward(mix_data)

    def _crop_slice(self, mix_np: np.ndarray):
        """(start, length) of the loudest `sweep_crop_seconds` window of the
        reference channel (prefix-sum energy argmax), or None when cropping
        is off / the mixture is already shorter.  Length is fixed per
        (T, crop) pair so the sweep programs compile once."""
        crop_s = getattr(self, "sweep_crop_seconds", 0.0)
        if crop_s <= 0:
            return None
        T = mix_np.shape[1]
        L = int(crop_s * FS)
        # keep at least the 12000-sample power window + shift margin
        L = max(L, 16384)
        if L >= T:
            return None
        x2 = np.cumsum(mix_np[0].astype(np.float64) ** 2)
        sums = x2[L - 1 :] - np.concatenate([[0.0], x2[: T - L]])
        return int(np.argmax(sums)), L

    def _forward(self, mix_data: np.ndarray):
        import jax.numpy as jnp

        # Upload the mixture ONCE; every stage (SRP map, coarse/fine sweeps,
        # separation) consumes the device-resident array — jnp.asarray on an
        # already-device f32 array is a no-op, so this removes three
        # 4 MB host->device transfers per mixture on the relayed runtime.
        mix_np = np.asarray(mix_data)
        crop = self._crop_slice(mix_np)
        mix_data = jnp.asarray(mix_np, dtype=jnp.float32)
        mix_sweep = (mix_data[:, crop[0] : crop[0] + crop[1]]
                     if crop is not None else None)
        self.times = [0.0] * 5
        patches, audio_loc, srp_drop, stage1_drop, spot_times = \
            self.localize_by_separation(mix_data, mix_sweep=mix_sweep)
        t0 = time.time()
        audio = self.separate_by_localization(mix_data, patches)
        self.times[4] = time.time() - t0
        return patches, audio_loc, audio, srp_drop, stage1_drop, spot_times

    def stage_metrics(self) -> dict:
        """Structured per-stage metrics (replaces the reference's prints)."""
        return {
            "time_srp_s": self.times[0],
            "time_coarse_spotform_s": self.times[1],
            "time_fine_spotform_s": self.times[2],
            "time_clustering_s": self.times[3],
            "time_separation_s": self.times[4],
            "spotform_calls": getattr(self.spot_model, "calls", 0),
        }

    __call__ = forward

    def localize_by_separation(self, mix_data: np.ndarray, mix_sweep=None):
        """`mix_sweep`: optional cropped view of `mix_data` for the selection
        sweeps (see `sweep_crop_seconds`); when given, cluster heads are
        re-spotformed on the full mixture inside stage 2."""
        assert self.previous_config is not None, \
            "Mic positions and speaker range not provided; call .setup() first"

        t0 = time.time()
        patch_list, simple_pos = self.mic_processor.apply_srp_phat(mix_data)
        self.times[0] = time.time() - t0
        if len(patch_list) <= 0:
            return [], [], 0, 0, 0

        sweep_mix = mix_sweep if mix_sweep is not None else mix_data
        t0 = time.time()
        # Dispatch the coarse sweep, then subdivide candidates on the host
        # while the device works.  Subdivision of ALL candidates costs more
        # than the device sweep, so poll the sweep's completion and stop
        # eagerly subdividing once the device is done — the remaining
        # survivors (a filtered subset) are subdivided on demand in stage 2,
        # which is cheaper than pre-subdividing every dropped candidate.
        self.mic_processor.big_spotforming_times = len(patch_list)
        coarse_sweep = self.spot_model.sweep(sweep_mix, patch_list, strict=0)
        done = getattr(coarse_sweep._totals, "is_ready", lambda: False)
        subdivided = {}
        for p in patch_list:
            subdivided[id(p)] = self.mic_processor.subdivide_patch(p)
            if done():
                break
        patch_list = self.mic_processor.spotform_big_patch(
            sweep_mix, patch_list, self.spot_model, sweep=coarse_sweep
        )
        self.times[1] = time.time() - t0
        if len(patch_list) <= 0:
            return [], [], 0, 0, 0

        t0 = time.time()
        output_pair = self.mic_processor.spotform_small_patch_parallel(
            sweep_mix, patch_list, self.spot_model, subdivided=subdivided,
            full_mix=mix_data if mix_sweep is not None else None,
        )
        self.times[2] = time.time() - t0
        if len(output_pair) <= 0:
            return [], [], 0, 0, 0

        t0 = time.time()
        audio_final, patch_final, spot_times, _ = \
            self.mic_processor.clustering_new(output_pair)
        self.times[3] = time.time() - t0
        if len(patch_final) <= 0:
            return [], [], 0, 0, 0
        return patch_final, np.array(audio_final), 0, 0, spot_times

    def separate_by_localization(self, mix_data: np.ndarray, target_patches):
        if len(target_patches) == 0:
            return None
        return self.sep_model.infer(mix_data, [p[0] for p in target_patches])

    def separate_by_localization_by_sample(self, mix_data: np.ndarray,
                                           sample_lists):
        if len(sample_lists) == 0:
            return None
        return self.sep_model.infer_sample(mix_data, sample_lists)

    def forward_streaming(self, mix_data: np.ndarray, chunk_samples: int,
                          merge_dist: float = 0.45, overlap: int = 0,
                          max_offset_jump: int = 6):
        """Long-form inference: process fixed-size chunks reusing the search
        setup (the chunked-streaming mode the reference leaves as future work,
        /root/reference/README.md:144).

        - Chunks advance by `chunk_samples - overlap`; the final chunk is
          aligned to the end of the stream so the tail is never dropped.
        - Tracks merge across chunks when EITHER the 2D position moves less
          than `merge_dist` OR every TDoA offset moves by at most
          `max_offset_jump` samples (offset continuity is robust where two
          speakers sit at similar ranges).
        - Each track's chunk audio is assembled into one full-length
          waveform with raised-cosine crossfades over the overlap regions
          (fade-in/out where the speaker is absent in a neighbouring chunk).

        Returns (tracks, per_chunk): tracks are dicts with "position",
        "offsets", "chunks" {chunk_idx: audio} and the assembled "audio"
        (T,); per_chunk holds each chunk's raw pipeline outputs."""
        M, T = mix_data.shape
        hop = chunk_samples - overlap
        assert hop > 0, "overlap must be smaller than chunk_samples"
        starts = list(range(0, max(T - chunk_samples, 0) + 1, hop))
        if starts[-1] + chunk_samples < T:
            starts.append(T - chunk_samples)  # tail-aligned final chunk

        tracks: list[dict] = []
        per_chunk = []
        for ci, start in enumerate(starts):
            chunk = mix_data[:, start : start + chunk_samples]
            if chunk.shape[1] < chunk_samples:  # stream shorter than a chunk
                chunk = np.pad(chunk,
                               ((0, 0), (0, chunk_samples - chunk.shape[1])))
            patches, audio_loc, audio, *_rest = self._forward(chunk)
            per_chunk.append((patches, audio_loc, audio))
            if len(patches) == 0:
                continue
            for k, pf in enumerate(patches):
                pos = np.asarray(pf[0].center_pos())
                off = np.asarray(pf[4]["localization_offset"])
                wav = audio[k] if audio is not None and k < len(audio) \
                    else audio_loc[k]
                for tr in tracks:
                    d2 = np.linalg.norm(np.asarray(tr["position"][:2])
                                        - pos[:2])
                    prev = np.asarray(tr["offsets"])
                    d_off = (np.max(np.abs(prev - off))
                             if prev.shape == off.shape else np.inf)
                    if (d2 < merge_dist or d_off <= max_offset_jump) \
                            and ci not in tr["chunks"]:
                        tr["chunks"][ci] = wav
                        tr["position"] = pos  # follow the latest estimate
                        tr["offsets"] = off
                        break
                else:
                    tracks.append({
                        "position": pos,
                        "offsets": off,
                        "chunks": {ci: wav},
                    })

        for tr in tracks:
            tr["audio"] = self._assemble_track(tr["chunks"], starts,
                                               chunk_samples, overlap, T)
        return tracks, per_chunk

    @staticmethod
    def _assemble_track(chunks: dict, starts: list, chunk_samples: int,
                        overlap: int, T: int) -> np.ndarray:
        """Overlap-add chunk waveforms into one stream with raised-cosine
        crossfades: complementary ramps sum to 1 where neighbouring chunks
        both contain the speaker, and fade smoothly to silence where only
        one does."""
        out = np.zeros(T, dtype=np.float32)
        wsum = np.zeros(T, dtype=np.float32)
        last_ci = len(starts) - 1
        for ci in sorted(chunks):
            start = starts[ci]
            n = min(chunk_samples, T - start)
            w = np.ones(n, dtype=np.float32)
            ramp = min(overlap, n // 2)
            if ramp > 1:
                r = 0.5 * (1.0 - np.cos(np.linspace(0.0, np.pi, ramp)))
                if ci > 0:
                    w[:ramp] *= r
                if ci < last_ci:
                    w[-ramp:] *= r[::-1]
            wav = np.asarray(chunks[ci], dtype=np.float32)[:n]
            out[start : start + n] += wav * w[: len(wav)]
            wsum[start : start + n] += w
        # tail-aligned final chunks overlap arbitrarily much with their
        # predecessor; average where total weight exceeds 1
        return out / np.maximum(wsum, 1.0)
