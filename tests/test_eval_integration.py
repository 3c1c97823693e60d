"""Full eval-driver integration: simulated sample dir -> result JSON ->
analyzer, with the delay-and-sum spotformer and a tiny separation net."""
import json
import os

import numpy as np
import pytest

from acousticswarms_speech_tpu.constants import FS
from acousticswarms_speech_tpu.data.roomsim import ShoeBox
from acousticswarms_speech_tpu.utils import write_wav

MIC = np.array([
    [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02], [3.7, 1.0, 0.02],
    [3.3, 1.5, 0.02], [3.3, 0.5, 0.02], [3.6, 1.15, 0.02],
])
ROI = [1.0, 6.0, 0.2, 5.0, 0.1, 0.6]


def _write_sample(d, srcs, T, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(d, exist_ok=True)
    room = ShoeBox([7.0, 6.0, 2.3], fs=FS, max_order=3, absorption=0.85)
    room.add_microphone_array(MIC.T)
    sigs = []
    for p in srcs:
        x = rng.normal(size=T) * 0.3
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1, 2.5)
                             * np.arange(T) / FS + rng.uniform(0, 6)), 0, None)
        sigs.append(x * env)
        room.add_source(p, x * env)
    premix = room.simulate(return_premix=True)[:, :, :T]
    mix = premix.sum(axis=0)
    metadata = {}
    for m in range(7):
        metadata[f"mic{m:02d}"] = {"position": MIC[m].tolist()}
        write_wav(os.path.join(d, f"mic{m:02d}_mixed.wav"), mix[m], FS)
    for vi, p in enumerate(srcs):
        metadata[f"voice{vi:02d}"] = {"position": list(p), "shifts": []}
        write_wav(os.path.join(d, f"mic00_voice{vi:02d}.wav"),
                  premix[vi, 0], FS)
    metadata["ROI"] = ROI
    metadata["real"] = False
    with open(os.path.join(d, "metadata.json"), "w") as f:
        json.dump(metadata, f)


class _DelayAndSumPipeline:
    """JointPipeline with the classical spotformer and pass-through
    'separation' (returns the localization audio)."""

    def __init__(self):
        from acousticswarms_speech_tpu.pipeline.joint import JointPipeline
        from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor

        self._inner = JointPipeline.__new__(JointPipeline)
        self._inner.spot_model = DelayAndSumExecutor(batch_size=64)
        self._inner.sep_model = None
        self._inner.times = [0.0] * 5
        self._inner.previous_config = None
        self._inner.mic_processor = None

    def setup(self, **kwargs):
        kwargs.pop("cache_dir", None)
        self._inner.setup(kwargs["mic_positions"], kwargs["speaker_range"],
                          grid_size=kwargs.get("grid_size", 0.05))

    @property
    def times(self):
        return self._inner.times

    def forward(self, mix):
        patches, audio_loc, srp_drop, stage1_drop, spot_times = \
            self._inner.localize_by_separation(mix)
        return patches, audio_loc, np.asarray(audio_loc), srp_drop, \
            stage1_drop, spot_times

    def make_lane(self):
        # lanes share the (stateless) executor; fresh MicArray stage state
        lane = _DelayAndSumPipeline()
        lane._inner.spot_model = self._inner.spot_model
        return lane


@pytest.mark.slow
def test_evaluate_dataset_end_to_end(tmp_path):
    from acousticswarms_speech_tpu.pipeline.analyze import analyze
    from acousticswarms_speech_tpu.pipeline.evaluate import evaluate_dataset

    ds = tmp_path / "ds"
    srcs = [np.array([4.8, 2.4, 0.4]), np.array([2.2, 3.4, 0.3])]
    _write_sample(str(ds / "00000"), srcs, T=36000, seed=1)

    model = _DelayAndSumPipeline()
    results = str(tmp_path / "results")
    out = evaluate_dataset(model, str(ds), results_folder=results,
                           grid_size=0.06)
    assert out["tp"] + out["fn"] == 2  # both GT speakers accounted for
    assert os.path.exists(os.path.join(results, "result_00000.json"))

    with open(os.path.join(results, "result_00000.json")) as f:
        rj = json.load(f)
    # reference schema fields present
    for key in ("mic_pos", "speaker_pos", "gt", "pred", "false_positive",
                "est_offsets", "perm"):
        assert key in rj
    assert len(rj["gt"]) == 2

    summary = analyze(results, verbose=False)
    assert summary["tp"] == out["tp"]
    # at least one true positive localized within the acceptance radius
    assert out["tp"] >= 1
    if summary["loc_err_median"] is not None:
        assert summary["loc_err_median"] < 1.0


@pytest.mark.slow
def test_evaluate_dataset_lanes_matches_serial(tmp_path):
    """Throughput mode (lanes=2) must produce identical counters and
    per-scene result JSONs as the serial loop."""
    from acousticswarms_speech_tpu.pipeline.evaluate import evaluate_dataset

    ds = tmp_path / "ds"
    scenes = [
        [np.array([4.8, 2.4, 0.4]), np.array([2.2, 3.4, 0.3])],
        [np.array([5.2, 3.8, 0.35])],
        [np.array([3.0, 4.2, 0.45]), np.array([1.8, 2.0, 0.3])],
    ]
    for i, srcs in enumerate(scenes):
        _write_sample(str(ds / f"{i:05d}"), srcs, T=36000, seed=10 + i)

    serial = str(tmp_path / "serial")
    out1 = evaluate_dataset(_DelayAndSumPipeline(), str(ds),
                            results_folder=serial, grid_size=0.06)
    laned = str(tmp_path / "laned")
    out2 = evaluate_dataset(_DelayAndSumPipeline(), str(ds),
                            results_folder=laned, grid_size=0.06, lanes=2)
    assert out1 == out2
    for i in range(len(scenes)):
        with open(os.path.join(serial, f"result_{i:05d}.json")) as f:
            r1 = json.load(f)
        with open(os.path.join(laned, f"result_{i:05d}.json")) as f:
            r2 = json.load(f)
        r1.pop("stage_times"), r2.pop("stage_times")
        assert r1 == r2
