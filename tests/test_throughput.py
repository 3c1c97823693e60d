"""Throughput mode (pipeline/throughput.py): lane sharing, ordering, and
serial-equality of the software-pipelined runner."""
import threading

import numpy as np
import pytest

from acousticswarms_speech_tpu.constants import FS
from acousticswarms_speech_tpu.pipeline.joint import JointPipeline
from acousticswarms_speech_tpu.pipeline.throughput import (
    PipelinedRunner,
    make_lane,
)


class _StubPipe:
    """Minimal JointPipeline stand-in for runner-logic tests."""

    def __init__(self):
        self.spot_model = object()
        self.sep_model = object()
        self.sweep_crop_seconds = 1.5

    def forward(self, item):
        return item * 2


def test_make_lane_shares_executors():
    pipe = JointPipeline.__new__(JointPipeline)
    pipe.spot_model = object()
    pipe.sep_model = object()
    pipe.sweep_crop_seconds = 1.5
    lane = make_lane(pipe)
    assert lane.spot_model is pipe.spot_model
    assert lane.sep_model is pipe.sep_model
    assert lane.sweep_crop_seconds == 1.5
    assert lane.mic_processor is None and lane.previous_config is None


def test_runner_preserves_order_and_uses_lanes():
    pipe = _StubPipe()
    lanes_seen = set()
    barrier = threading.Barrier(2, timeout=10)

    def work(lane, item, i):
        lanes_seen.add(id(lane))
        if i < 2:
            # force both lanes to be concurrently active at least once
            barrier.wait()
        return (i, item * 10)

    # make_lane on the stub works because it only copies attributes
    runner = PipelinedRunner.__new__(PipelinedRunner)
    runner.lanes = [pipe, make_lane(pipe)]
    results, stats = runner.run(list(range(8)), work_fn=work)
    assert results == [(i, i * 10) for i in range(8)]
    assert len(lanes_seen) == 2
    assert stats["n"] == 8 and stats["mixtures_per_sec"] > 0
    assert len(stats["lane_utilization"]) == 2


def test_runner_propagates_worker_error():
    pipe = _StubPipe()
    runner = PipelinedRunner.__new__(PipelinedRunner)
    runner.lanes = [pipe, make_lane(pipe)]

    def work(lane, item, i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        runner.run(list(range(6)), work_fn=work)


@pytest.mark.slow
def test_pipelined_matches_serial_delay_and_sum():
    """Two lanes running the stage-0..3 stack must produce the same final
    clusters as a serial loop (shared executor, independent MicArrays)."""
    from acousticswarms_speech_tpu.pipeline.mic_array import MicArray
    from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor

    mic_pos = np.array([
        [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02],
        [3.7, 1.0, 0.02], [3.3, 1.5, 0.02], [3.3, 0.5, 0.02],
        [3.6, 1.15, 0.02],
    ])
    roi = [2.0, 5.0, 0.5, 4.0, 0.2, 0.5]
    rng = np.random.default_rng(0)
    T = int(0.5 * FS)

    def scene(seed):
        r = np.random.default_rng(seed)
        x = r.normal(size=T).astype(np.float32) * 0.3
        mix = np.stack([np.roll(x, s) for s in
                        [0, 3, -5, 7, -2, 4, 1]])
        return mix + 0.01 * rng.normal(size=mix.shape).astype(np.float32)

    mixes = [scene(s) for s in range(3)]
    spot = DelayAndSumExecutor(batch_size=64)

    def run_one(arr, mix):
        patch_list, _ = arr.apply_srp_phat(mix)
        if not patch_list:
            return []
        big = arr.spotform_big_patch(mix, patch_list, spot)
        if not big:
            return []
        pairs = arr.spotform_small_patch_parallel(mix, big, spot)
        if not pairs:
            return []
        _, patch_final, _, _ = arr.clustering_new(pairs)
        return sorted(tuple(np.round(p[0].center_pos(), 6))
                      for p in patch_final)

    serial_arr = MicArray(mic_pos, spk_range=roi, grid_size=0.1)
    serial = [run_one(serial_arr, m) for m in mixes]

    arrays = [MicArray(mic_pos, spk_range=roi, grid_size=0.1)
              for _ in range(2)]

    class _Lane:
        def __init__(self, arr):
            self.spot_model = spot
            self.sep_model = None
            self.sweep_crop_seconds = 0.0
            self.arr = arr

    runner = PipelinedRunner.__new__(PipelinedRunner)
    runner.lanes = [_Lane(a) for a in arrays]
    results, _ = runner.run(mixes,
                            work_fn=lambda lane, m, i: run_one(lane.arr, m))
    assert results == serial
