"""Subdivision invariants: splits cover the parent, widths halve, terminal
patches satisfy the stopping conditions."""
import numpy as np

from acousticswarms_speech_tpu.constants import (
    FS,
    MIN_AREA,
    MIN_WIDTH_REQUIRED,
    SPEED_OF_SOUND,
)
from acousticswarms_speech_tpu.dsp.geometry import build_geometry
from acousticswarms_speech_tpu.dsp.patch import hyperbola_area_init
from acousticswarms_speech_tpu.dsp.patch import Patch
from acousticswarms_speech_tpu.search.subdivide import (
    binary_area_divide_width,
    search_area,
)
from acousticswarms_speech_tpu.utils.shift import sample_offsets_for

MIC = np.array([
    [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02], [3.7, 1.0, 0.02],
    [3.3, 1.5, 0.02], [3.3, 0.5, 0.02], [3.6, 1.15, 0.02],
])
ROI = [1.0, 6.0, 0.2, 5.0, 0.1, 0.62]


def _initial_patch(geom, src):
    offs = sample_offsets_for(src, MIC, FS)[0]
    offs_r = np.round(offs)
    pts = hyperbola_area_init(geom, offs_r, 8.2)
    assert pts is not None and pts.shape[1] > 0
    return Patch(offs_r, [8.0] * 6, pts, None)


def test_search_area_terminates_with_small_patches():
    geom = build_geometry(MIC, ROI, grid_size=0.1)
    src = np.array([4.5, 2.5, 0.4])
    patch = _initial_patch(geom, src)
    n_parent = patch.area_size()
    upper = (np.linalg.norm(MIC[1:] - MIC[0], axis=1) + 0.08) \
        / SPEED_OF_SOUND * FS
    out = search_area([patch], MIC, upper)
    assert len(out) >= 1
    total_pts = 0
    for p in out:
        # terminal condition from the reference (local_utils_3d.py:260)
        assert np.amax(p.width_list) / 2 <= MIN_WIDTH_REQUIRED \
            or p.area_size() <= MIN_AREA
        total_pts += p.area_size()
    # subdivision partitions the parent's points (points on split boundaries
    # can be claimed by both halves, so >= parent count)
    assert total_pts >= n_parent * 0.95


def test_binary_split_halves_width_and_preserves_points():
    geom = build_geometry(MIC, ROI, grid_size=0.1)
    src = np.array([4.5, 2.5, 0.4])
    patch = _initial_patch(geom, src)
    samples = sample_offsets_for(patch.area_points.T, MIC, FS).T
    cont, children, child_samples = binary_area_divide_width(
        patch, samples, MIC, None
    )
    assert cont and len(children) >= 1
    parent_width = 8.0
    for c in children:
        assert np.min(c.width_list) == parent_width / 2
        assert c.area_size() > 0
    assert sum(c.area_size() for c in children) >= patch.area_size() * 0.9


def test_power_trace_records_coarse_decision(monkeypatch):
    """With tracing enabled, binary_search_baseline records every candidate's
    offsets and distance-compensated powers (consumed by
    scripts/tune_thresholds.py for offline threshold re-tuning)."""
    from acousticswarms_speech_tpu.search import power_trace
    from acousticswarms_speech_tpu.search.subdivide import (
        binary_search_baseline,
    )

    monkeypatch.setattr(power_trace, "ENABLED", True)
    power_trace.drain()

    geom = build_geometry(MIC, ROI, grid_size=0.1)
    patches = [_initial_patch(geom, np.array([4.5, 2.5, 0.4])),
               _initial_patch(geom, np.array([2.0, 3.0, 0.3]))]

    class FakeSweep:
        powers = [1.0, 0.5]
        powers_win = [0.02, 0.001]

    kept, powers_with_dis, rel = binary_search_baseline(
        None, None, patches, MIC, sweep=FakeSweep())
    recs = power_trace.drain()
    assert len(recs) == 2 and recs[0]["stage"] == "coarse"
    assert len(recs[0]["offsets"]) == 2
    assert recs[0]["powers_win"] == [0.02, 0.001]
    assert recs[0]["powers_with_dis"] == [float(p) for p in powers_with_dis]
    # round-4: cap telemetry record (scripts/analyze_retention.py cap_drop)
    assert recs[1]["stage"] == "coarse_keep"
    assert recs[1]["n_kept"] == len(kept)
    assert recs[1]["n_truncated"] == recs[1]["n_passing"] - recs[1]["n_kept"]
    assert power_trace.drain() == []  # drained
