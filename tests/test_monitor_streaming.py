"""Monitor/visualization and streaming-pipeline tests."""
import os

import numpy as np
import pytest

from acousticswarms_speech_tpu.constants import FS
from acousticswarms_speech_tpu.data.roomsim import ShoeBox
from acousticswarms_speech_tpu.pipeline.mic_array import MicArray
from acousticswarms_speech_tpu.pipeline.monitor import (
    MicArrayMonitor,
    visualize_patches,
    visualize_result,
    visualize_spot_powers,
    visualize_srp_layers,
)
from acousticswarms_speech_tpu.utils.shift import sample_offsets_for

MIC = np.array([
    [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02], [3.7, 1.0, 0.02],
    [3.3, 1.5, 0.02], [3.3, 0.5, 0.02], [3.6, 1.15, 0.02],
])
ROI = [1.0, 6.0, 0.2, 5.0, 0.1, 0.62]


def _scene(srcs, T, seed=0):
    rng = np.random.default_rng(seed)
    room = ShoeBox([7.0, 6.0, 2.3], fs=FS, max_order=2, absorption=0.9)
    room.add_microphone_array(MIC.T)
    for p in srcs:
        room.add_source(p, rng.normal(size=T) * 0.3)
    return room.simulate()[:, :, :T].sum(axis=0)


def test_monitor_and_visualizations(tmp_path):
    srcs = [np.array([4.8, 2.4, 0.4])]
    T = 24000
    mix = _scene(srcs, T)
    arr = MicArray(MIC, spk_range=ROI, grid_size=0.08)
    patches, _ = arr.apply_srp_phat(mix)
    assert len(patches) > 0

    gt_off = sample_offsets_for(np.array(srcs), MIC, FS).T
    mon = MicArrayMonitor(MIC, np.array(srcs), gt_off, str(tmp_path))
    labels = mon.label_patches(patches)
    assert any(labels), "no SRP candidate covers the true source"

    visualize_srp_layers(arr.srp, np.array(srcs), str(tmp_path))
    visualize_patches(patches, MIC, np.array(srcs), ROI,
                      str(tmp_path / "patches.png"))
    visualize_spot_powers(MIC, np.array(srcs), ROI,
                          [p.center_pos() for p in patches],
                          np.arange(len(patches)),
                          str(tmp_path / "powers.png"))
    fake_final = [(patches[0], mix[0], 1.0, "0_0",
                   {"audio_offset": patches[0].sample_offset,
                    "localization_offset": patches[0].sample_offset}, -1)]
    visualize_result(MIC, np.array(srcs), fake_final, ROI,
                     str(tmp_path / "result.png"))
    assert (tmp_path / "patches.png").exists()
    assert (tmp_path / "powers.png").exists()
    assert (tmp_path / "result.png").exists()


@pytest.mark.slow
def test_streaming_chunks_track_speaker():
    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline
    from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor

    srcs = [np.array([4.8, 2.4, 0.4])]
    T = 2 * 24000
    mix = _scene(srcs, T, seed=3)

    class _Pipe(JointPipeline):
        def __init__(self):
            self.spot_model = DelayAndSumExecutor(batch_size=64)
            self.sep_model = None
            self.times = [0.0] * 5
            self.previous_config = None
            self.mic_processor = None

        def separate_by_localization(self, mix_data, target_patches):
            return None

    pipe = _Pipe()
    pipe.setup(MIC, ROI, grid_size=0.08)
    tracks, per_chunk = pipe.forward_streaming(mix, 24000)
    assert len(per_chunk) == 2
    assert len(tracks) >= 1
    best = min(tracks, key=lambda t: np.linalg.norm(
        np.asarray(t["position"][:2]) - srcs[0][:2]))
    assert np.linalg.norm(np.asarray(best["position"][:2]) - srcs[0][:2]) < 0.6
    # the tracked speaker appears in both chunks
    assert len(best["chunks"]) == 2
