"""TDoA-consistency scorer: measured cross-correlation lags must match the
claimed pair offsets for a genuinely-positioned extraction and expose the
offset gap for a leaked (off-position) one."""
import numpy as np

from acousticswarms_speech_tpu.dsp.patch import Patch
from acousticswarms_speech_tpu.search import clustering

from acousticswarms_speech_tpu.search.consistency import (
    head_deviations,
    measured_lags,
    tdoa_deviation,
)


def _scene(rng, T=48000, taus=(0, 7, -12, 23, -31, 4, 15), align=-9):
    """x_m(t) = s(t - tau_m) + small noise; y = s(t - align)."""
    pad = 128
    s = rng.standard_normal(T + 2 * pad).astype(np.float32)
    x = np.stack([s[pad - tau: pad - tau + T] for tau in taus])
    x += 0.05 * rng.standard_normal(x.shape).astype(np.float32)
    y = s[pad - align: pad - align + T]
    offsets = np.array(taus[1:]) - taus[0]
    return y, x, offsets


def test_measured_lags_recover_shifts():
    rng = np.random.default_rng(0)
    y, x, offsets = _scene(rng)
    lags = measured_lags(y, x)
    # lag_m = tau_m - align
    assert lags[0] == 0 - (-9)
    np.testing.assert_array_equal(lags[1:] - lags[0], offsets)


def test_deviation_zero_for_true_position():
    rng = np.random.default_rng(1)
    y, x, offsets = _scene(rng)
    assert tdoa_deviation(y, x, offsets) == 0.0


def test_deviation_exposes_off_position_claim():
    rng = np.random.default_rng(2)
    y, x, offsets = _scene(rng)
    delta = np.array([9, -6, 0, 3, -11, 7])
    wrong = offsets + delta
    # robust statistic: median |d - median(d)| over d = [0, -delta]
    d = np.concatenate([[0.0], -delta])
    expected = float(np.median(np.abs(d - np.median(d))))
    # hand-computed anchor, independent of the shared formula (ADVICE r4):
    # d = [0,-9,6,0,-3,11,-7], median(d)=0, |d| sorted = [0,0,3,6,7,9,11]
    # -> median 6.0.  A sign-convention bug in both places would break this.
    assert expected == 6.0
    assert tdoa_deviation(y, x, wrong) == expected
    assert expected >= 5.0  # clearly leak-side of the gate scale


def test_deviation_with_interfering_speaker():
    """A weaker interfering speaker must not flip the measured lags of a
    dominant, correctly-positioned extraction."""
    rng = np.random.default_rng(3)
    y, x, offsets = _scene(rng)
    y2, x2, _ = _scene(rng, taus=(5, -20, 9, -2, 17, -33, 8))
    mix = x + 0.5 * x2
    assert tdoa_deviation(y, mix, offsets) == 0.0


def test_batched_matches_single():
    rng = np.random.default_rng(5)
    y, x, offsets = _scene(rng)
    y2, _, _ = _scene(rng, taus=(5, -20, 9, -2, 17, -33, 8))
    wrong = offsets + 4
    batched = head_deviations([y, y2, y], x, [offsets, offsets, wrong])
    singles = [tdoa_deviation(y, x, offsets),
               tdoa_deviation(y2, x, offsets),
               tdoa_deviation(y, x, wrong)]
    assert batched == singles


def test_nms_gate_drops_offposition_head(monkeypatch):
    """With the opt-in gate on, a higher-power but position-inconsistent
    head is dropped BEFORE the greedy merge, so the true (lower-power,
    consistent) head survives as its own cluster instead of being
    absorbed."""
    rng = np.random.default_rng(6)
    T = 30000
    a = rng.normal(size=T) * np.clip(
        np.sin(2 * np.pi * 2.0 * np.arange(T) / 48000), 0, None)

    def pair(pos, audio, power, tag, dev):
        p = Patch(np.zeros(6), [3.0] * 6, None, peak_pos=np.asarray(pos))
        return (p, audio, power, tag,
                {"audio_offset": np.zeros(6),
                 "localization_offset": np.zeros(6),
                 "tdoa_dev": dev}, -1)

    leak = pair([3.0, 3.0, 0.3], a, 2.0, "1_0", dev=31.0)
    true_head = pair([1.0, 1.0, 0.3],
                     a + 1e-4 * rng.normal(size=T), 1.0, "0_0", dev=1.0)

    # Gate off, election off, split off: identical audio -> the leak wins
    # on power.
    monkeypatch.setattr(clustering, "NMS_TDOA_ELECT", False)
    monkeypatch.setattr(clustering, "NMS_SPLIT_DEV", 0.0)
    _, final, _ = clustering.clustering_nms([leak, true_head])
    assert len(final) == 1 and final[0][3] == "1_0"

    # Gate on: the leak is dropped, the true head survives.
    monkeypatch.setattr(clustering, "NMS_TDOA_GATE", 8.0)
    _, final, _ = clustering.clustering_nms([leak, true_head])
    assert len(final) == 1 and final[0][3] == "0_0"


def test_nms_elect_reports_consistent_member(monkeypatch):
    """With election on, a cluster formed under an off-position head is
    reported through its most position-consistent member."""
    rng = np.random.default_rng(7)
    T = 30000
    a = rng.normal(size=T) * np.clip(
        np.sin(2 * np.pi * 2.0 * np.arange(T) / 48000), 0, None)

    def pair(pos, audio, power, tag, dev):
        p = Patch(np.zeros(6), [3.0] * 6, None, peak_pos=np.asarray(pos))
        return (p, audio, power, tag,
                {"audio_offset": np.zeros(6),
                 "localization_offset": np.zeros(6),
                 "tdoa_dev": dev}, -1)

    leak = pair([3.0, 3.0, 0.3], a, 2.0, "1_0", dev=31.0)
    true_head = pair([1.0, 1.0, 0.3],
                     a + 1e-4 * rng.normal(size=T), 1.0, "0_0", dev=1.0)

    monkeypatch.setattr(clustering, "NMS_TDOA_ELECT", True)
    _, final, _ = clustering.clustering_nms([leak, true_head])
    assert len(final) == 1 and final[0][3] == "0_0"


def test_nms_split_emits_distinct_consistent_member(monkeypatch):
    """With the consistency split on, a merged cluster hiding a second
    position-consistent member far from the head emits it as an extra
    head; an inconsistent or nearby member is not emitted."""
    rng = np.random.default_rng(8)
    T = 30000
    a = rng.normal(size=T) * np.clip(
        np.sin(2 * np.pi * 2.0 * np.arange(T) / 48000), 0, None)

    def pair(pos, audio, power, tag, dev):
        p = Patch(np.zeros(6), [3.0] * 6, None, peak_pos=np.asarray(pos))
        return (p, audio, power, tag,
                {"audio_offset": np.zeros(6),
                 "localization_offset": np.zeros(6),
                 "tdoa_dev": dev}, -1)

    head = pair([1.0, 1.0, 0.3], a, 2.0, "head", dev=0.5)
    far_good = pair([3.0, 3.0, 0.3],
                    a + 1e-4 * rng.normal(size=T), 1.0, "far_good", dev=1.0)
    far_bad = pair([4.5, 1.0, 0.3],
                   a + 2e-4 * rng.normal(size=T), 0.9, "far_bad", dev=20.0)
    near_good = pair([1.2, 1.0, 0.3],
                     a + 3e-4 * rng.normal(size=T), 0.8, "near_good", dev=0.8)

    # all four merge into one cluster (identical audio); split off: 1 head
    monkeypatch.setattr(clustering, "NMS_SPLIT_DEV", 0.0)
    _, final, _ = clustering.clustering_nms(
        [head, far_good, far_bad, near_good])
    assert [f[3] for f in final] == ["head"]

    monkeypatch.setattr(clustering, "NMS_SPLIT_DEV", 3.0)
    monkeypatch.setattr(clustering, "NMS_SPLIT_DIS", 0.8)
    _, final, _ = clustering.clustering_nms(
        [head, far_good, far_bad, near_good])
    assert [f[3] for f in final] == ["head", "far_good"]

    # power floor: far_good at 10% of the head's power is dropped
    weak = pair([3.0, 3.0, 0.3], far_good[1], 0.2, "weak", dev=1.0)
    _, final, _ = clustering.clustering_nms([head, weak, far_bad, near_good])
    assert [f[3] for f in final] == ["head"]

    # split cap: never beyond NMS_SPLIT_MAX total heads
    monkeypatch.setattr(clustering, "NMS_SPLIT_MAX", 1)
    _, final, _ = clustering.clustering_nms(
        [head, far_good, far_bad, near_good])
    assert [f[3] for f in final] == ["head"]


def test_leaked_extraction_scores_high():
    """An extraction whose content is a DIFFERENT source (dominant-speaker
    leakage at an off-target position) deviates by the TDoA gap between the
    claimed and true positions."""
    rng = np.random.default_rng(4)
    _, x, offsets = _scene(rng)
    taus2 = (5, -20, 9, -2, 17, -33, 8)
    y2, x2, _ = _scene(rng, taus=taus2)
    mix = x + x2
    # head claims the first source's position but contains the second
    dev = tdoa_deviation(y2, mix, offsets)
    true_rel = np.array(taus2[1:]) - taus2[0]
    d = np.concatenate([[0.0], true_rel - offsets])
    expected = float(np.median(np.abs(d - np.median(d))))
    assert dev == expected
    assert expected >= 5.0
