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


def test_assemble_track_crossfade_complementary():
    """Neighbouring chunks both containing the speaker must reconstruct a
    constant signal exactly (complementary raised-cosine ramps sum to 1)."""
    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline

    chunk, overlap = 1000, 200
    starts = [0, 800, 1600]
    T = 2600
    chunks = {ci: np.ones(chunk, dtype=np.float32) for ci in range(3)}
    out = JointPipeline._assemble_track(chunks, starts, chunk, overlap, T)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_assemble_track_fades_at_absent_neighbor():
    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline

    chunk, overlap = 1000, 200
    starts = [0, 800, 1600]
    T = 2600
    chunks = {1: np.ones(chunk, dtype=np.float32)}  # speaker only mid-chunk
    out = JointPipeline._assemble_track(chunks, starts, chunk, overlap, T)
    assert out[:800].max() <= 1e-6 or out[0] == 0.0
    assert abs(out[1200] - 1.0) < 1e-6  # plateau intact
    # smooth ramp into the chunk, not a hard edge
    assert 0.0 < out[850] < 1.0


def test_streaming_tail_never_dropped():
    """A stream whose length is not a multiple of the hop must still be fully
    covered (round-1 bug dropped up to chunk-1 trailing samples)."""
    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline

    calls = []

    class _Probe(JointPipeline):
        def __init__(self):
            self.times = [0.0] * 5
            self.previous_config = "set"
            self.mic_processor = None

        def _forward(self, chunk):
            calls.append(chunk.shape[1])
            return [], [], None, 0, 0, 0

    pipe = _Probe()
    mix = np.zeros((7, 24000 * 2 + 7000), dtype=np.float32)
    tracks, per_chunk = pipe.forward_streaming(mix, 24000)
    # chunks at 0, 24000, and a tail-aligned final chunk at T-24000
    assert len(per_chunk) == 3
    assert all(c == 24000 for c in calls)


@pytest.mark.slow
def test_streaming_longform_speaker_enters_midstream():
    """30 s stream; speaker B starts speaking at t=15 s.  The stream must
    yield two tracks, with B's assembled audio silent before entry."""
    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline
    from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor

    rng = np.random.default_rng(5)
    T = 30 * FS
    room = ShoeBox([7.0, 6.0, 2.3], fs=FS, max_order=2, absorption=0.9)
    room.add_microphone_array(MIC.T)
    sig_a = rng.normal(size=T) * 0.3
    sig_b = rng.normal(size=T) * 0.3
    sig_b[: 15 * FS] = 0.0  # B enters mid-stream
    pos_a, pos_b = np.array([4.8, 2.4, 0.4]), np.array([1.8, 3.6, 0.4])
    room.add_source(pos_a, sig_a)
    room.add_source(pos_b, sig_b)
    mix = room.simulate()[:, :, :T].sum(axis=0)

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
    chunk, overlap = 6 * FS, FS
    tracks, per_chunk = pipe.forward_streaming(mix, chunk, overlap=overlap)
    assert len(per_chunk) == (T - chunk) // (chunk - overlap) + 1 + (
        1 if ((T - chunk) % (chunk - overlap)) else 0)

    def closest(pos):
        return min(tracks, key=lambda t: np.linalg.norm(
            np.asarray(t["position"][:2]) - pos[:2]))

    tr_a, tr_b = closest(pos_a), closest(pos_b)
    assert np.linalg.norm(np.asarray(tr_a["position"][:2]) - pos_a[:2]) < 0.6
    assert np.linalg.norm(np.asarray(tr_b["position"][:2]) - pos_b[:2]) < 0.6
    assert tr_a is not tr_b
    # A speaks from the start; B's first chunk comes after entry
    assert min(tr_a["chunks"]) == 0
    assert min(tr_b["chunks"]) >= (15 * FS - chunk) // (chunk - overlap)
    # assembled audio exists and B is (near-)silent before entering
    assert tr_b["audio"].shape == (T,)
    pre = np.abs(tr_b["audio"][: 10 * FS]).max()
    post = np.abs(tr_b["audio"][16 * FS :]).max()
    assert post > 5 * max(pre, 1e-9)
