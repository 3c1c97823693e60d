"""The offline NMS replay (scripts/replay_nms.py) must reproduce the live
greedy clustering from trace records alone: same head count and same
surviving GT labels at the live thresholds.  Guards the round-4 trace
extensions (pair_sisdr / powers / centers / has_segments in nms_summary,
per-tested-pair nms_pair records) that threshold re-tuning depends on."""
import importlib.util
import os

import numpy as np

from acousticswarms_speech_tpu.dsp.patch import Patch
from acousticswarms_speech_tpu.search import clustering, power_trace


def _load_replay():
    path = os.path.join(os.path.dirname(__file__), "..", "scripts",
                        "replay_nms.py")
    spec = importlib.util.spec_from_file_location("replay_nms", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _pair(pos, audio, power, tag, label=-1):
    p = Patch(np.zeros(6), [3.0] * 6, None, peak_pos=np.asarray(pos))
    return (p, audio, power, tag,
            {"audio_offset": np.zeros(6), "localization_offset": np.zeros(6)},
            label)


def _voiced(rng, T=30000, scale=0.3):
    env = np.clip(np.sin(2 * np.pi * 2.0 * np.arange(T) / 48000), 0, None)
    return rng.normal(size=T) * scale * env


def test_replay_matches_live_nms(monkeypatch):
    monkeypatch.setattr(power_trace, "ENABLED", True)
    power_trace.drain()
    rng = np.random.default_rng(7)
    a, b, c = _voiced(rng), _voiced(rng), _voiced(rng)
    pairs = [
        _pair([1.0, 1.0, 0.3], a, 4.0, "0_0", label=0),
        # near-duplicate of the head: merges by the full-SI-SDR rule
        _pair([3.0, 3.0, 0.3], a + 1e-4 * rng.normal(size=len(a)), 3.0,
              "1_0", label=1),
        # distinct audio, distant position: survives as a second head
        _pair([4.0, 0.5, 0.3], b, 2.0, "2_0", label=2),
        # distinct audio but 0.2 m from the first head: merges by distance
        _pair([1.2, 1.0, 0.3], c, 1.0, "3_0"),
        # silent: dropped before clustering (has_segments False)
        _pair([0.5, 4.0, 0.3], np.zeros(30000), 0.5, "4_0"),
    ]
    sigs = [p[1] for p in pairs]
    from acousticswarms_speech_tpu.utils.metrics import si_sdr
    mat = np.array([[si_sdr(x, y) for y in sigs] for x in sigs])
    audio, final, _ = clustering_nms_with_trace(pairs, pair_sisdr=mat)
    recs = power_trace.drain()

    summary = next(r for r in recs if r["stage"] == "nms_summary")
    assert summary["pair_sisdr"] is not None
    assert len(summary["powers"]) == len(summary["in_labels"])
    assert len(summary["centers"]) == len(summary["in_labels"])
    assert summary["has_segments"].count(False) == 1
    tested = {(r["i"], r["head"]) for r in recs if r["stage"] == "nms_pair"}
    assert tested  # live pass recorded its windowed tests

    replay_mod = _load_replay()
    pair_recs = {(r["i"], r["head"]): r for r in recs
                 if r["stage"] == "nms_pair"}
    n_heads, out_labels, labeled_heads, _, missing, _ = replay_mod.replay(
        summary, pair_recs, clustering.NMS_SISDR_THRESHOLD,
        win_thr=clustering.NMS_WIN_THRESHOLD,
        win_thr2=clustering.NMS_WIN_THRESHOLD2,
        dis_thr=clustering.NMS_DIS_THRESHOLD,
        max_out=clustering.NMS_MAX_OUT)
    assert missing == 0  # at the live threshold every pair was tested live
    assert n_heads == len(final)
    live_labels = {lab for lab in summary["out_labels"] if lab >= 0}
    assert out_labels == live_labels


def clustering_nms_with_trace(pairs, pair_sisdr=None):
    from acousticswarms_speech_tpu.search.clustering import clustering_nms
    return clustering_nms(pairs, pair_sisdr=pair_sisdr)
