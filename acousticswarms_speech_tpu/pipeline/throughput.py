"""Throughput mode: software-pipelined evaluation of independent mixtures.

The reference evaluates scenes one at a time in a strictly serial loop
(/root/reference/sep/eval/eval_model.py:111) — but the scenes are
independent, so on one chip the only fundamental serialization is the
device work itself.  Each mixture's wall time splits into

  host work  (SRP peak-picking, patch subdivision, NMS, consistency
              scoring, result IO)  — CPU, releases the chip
  device work (SRP map, coarse/fine sweeps, head sweep, separation)

This runner drives N *lanes* (default 2) from worker threads.  Every lane
is a `JointPipeline` view sharing the SAME executor objects — so compiled
sweep programs, network parameters (HBM) and the bucket ladder are shared
— but owning its own `MicArray` stage state (candidate bookkeeping,
`_last_head_sim`), so two in-flight mixtures never trample each other.
While lane A blocks in a device sweep, lane B's host stages run; XLA
serializes the actual device programs.  Gain = the host fraction of the
per-mixture time (grows once SPOT_CROP_SECONDS shrinks the sweeps).

No reference counterpart (the reference has no throughput mode); the
measurement protocol still honors /root/reference/README.md:144 by
excluding compile/setup.
"""
from __future__ import annotations

import threading
import time

from .joint import JointPipeline


def make_lane(pipe: JointPipeline) -> JointPipeline:
    """A pipeline view sharing `pipe`'s executors (compiled programs +
    device-resident params) with independent per-mixture stage state."""
    lane = JointPipeline.__new__(JointPipeline)
    lane.spot_model = pipe.spot_model
    lane.sep_model = pipe.sep_model
    lane.sweep_crop_seconds = pipe.sweep_crop_seconds
    lane.times = [0.0] * 5
    lane.previous_config = None
    lane.mic_processor = None
    return lane


class PipelinedRunner:
    """Run many independent mixtures through `n_lanes` pipeline lanes.

    `setup_fn(lane)` is called once per lane (MicArray geometry — disk-
    cached, so lanes beyond the first are cheap).  `run` preserves input
    order in its results and reports per-lane utilization.
    """

    def __init__(self, pipe: JointPipeline, n_lanes: int = 2,
                 setup_fn=None):
        self.lanes = [pipe]
        # Duck-typed lane creation: a custom pipeline (e.g. the test
        # pass-through wrapper) may provide its own make_lane().
        clone = getattr(pipe, "make_lane", None) or (lambda: make_lane(pipe))
        for _ in range(n_lanes - 1):
            self.lanes.append(clone())
        if setup_fn is not None:
            for lane in self.lanes:
                setup_fn(lane)

    def run(self, mixtures, work_fn=None):
        """`mixtures`: sequence of (M, T) arrays (or of arbitrary work items
        when `work_fn` is given).  Default work is `lane.forward(item)`.
        Returns (results_in_order, stats)."""
        n = len(mixtures)
        results = [None] * n
        errors = [None] * n
        next_idx = [0]
        idx_lock = threading.Lock()
        busy = [0.0] * len(self.lanes)

        def worker(lane_id):
            lane = self.lanes[lane_id]
            while True:
                with idx_lock:
                    i = next_idx[0]
                    if i >= n:
                        return
                    next_idx[0] = i + 1
                t0 = time.time()
                try:
                    if work_fn is not None:
                        results[i] = work_fn(lane, mixtures[i], i)
                    else:
                        results[i] = lane.forward(mixtures[i])
                except Exception as e:  # noqa: BLE001 — keep other lanes alive
                    errors[i] = e
                busy[lane_id] += time.time() - t0

        t_start = time.time()
        threads = [threading.Thread(target=worker, args=(k,), daemon=True)
                   for k in range(len(self.lanes))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.time() - t_start
        first_err = next((e for e in errors if e is not None), None)
        if first_err is not None:
            raise first_err
        stats = {
            "wall_s": wall,
            "n": n,
            "mixtures_per_sec": n / wall if wall > 0 else 0.0,
            "lane_busy_s": list(busy),
            "lane_utilization": [b / wall if wall > 0 else 0.0 for b in busy],
        }
        return results, stats
