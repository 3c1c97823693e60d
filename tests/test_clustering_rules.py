"""Behavioral tests of the NMS decision rules (Mic_Array.Clustering_new
semantics): join on similarity, join on proximity, split otherwise."""
import numpy as np

from acousticswarms_speech_tpu.dsp.patch import Patch
from acousticswarms_speech_tpu.search.clustering import (
    check_sisnr_win,
    clustering_nms,
    weight_mean_pos,
)


def _pair(pos, audio, power, tag, label=-1):
    p = Patch(np.zeros(6), [3.0] * 6, None, peak_pos=np.asarray(pos))
    return (p, audio, power, tag,
            {"audio_offset": np.zeros(6), "localization_offset": np.zeros(6)},
            label)


def _voiced(rng, T=30000, scale=0.3):
    env = np.clip(np.sin(2 * np.pi * 2.0 * np.arange(T) / 48000), 0, None)
    return rng.normal(size=T) * scale * env


def test_identical_audio_merges():
    rng = np.random.default_rng(0)
    a = _voiced(rng)
    pairs = [
        _pair([1.0, 1.0, 0.3], a, 2.0, "0_0"),
        _pair([3.0, 3.0, 0.3], a + 1e-4 * rng.normal(size=len(a)), 1.0, "1_0"),
    ]
    audio, final, _ = clustering_nms(pairs)
    assert len(final) == 1  # high SI-SDR similarity -> same speaker


def test_nearby_positions_merge_even_if_dissimilar():
    rng = np.random.default_rng(1)
    pairs = [
        _pair([1.0, 1.0, 0.3], _voiced(rng), 2.0, "0_0"),
        _pair([1.2, 1.0, 0.3], _voiced(rng), 1.0, "1_0"),  # 0.2 m < 0.45 m
    ]
    audio, final, _ = clustering_nms(pairs)
    assert len(final) == 1


def test_distant_dissimilar_stay_separate():
    rng = np.random.default_rng(2)
    pairs = [
        _pair([1.0, 1.0, 0.3], _voiced(rng), 2.0, "0_0"),
        _pair([4.0, 3.0, 0.3], _voiced(rng), 1.0, "1_0"),
    ]
    audio, final, _ = clustering_nms(pairs)
    assert len(final) == 2


def test_silent_candidate_dropped():
    rng = np.random.default_rng(3)
    pairs = [
        _pair([1.0, 1.0, 0.3], _voiced(rng), 2.0, "0_0"),
        _pair([4.0, 3.0, 0.3], np.zeros(30000), 1.0, "1_0"),  # no segments
    ]
    audio, final, _ = clustering_nms(pairs)
    assert len(final) == 1


def test_pair_sisdr_matrix_equivalent():
    """Supplying the precomputed pair matrix must give the same clusters."""
    from acousticswarms_speech_tpu.utils.metrics import si_sdr

    rng = np.random.default_rng(4)
    base = _voiced(rng)
    audios = [base, base + 0.05 * rng.normal(size=len(base)),
              _voiced(rng), _voiced(rng)]
    positions = [[1, 1, 0.3], [1.1, 1.05, 0.3], [3, 1, 0.3], [1, 4, 0.3]]
    powers = [4.0, 3.0, 2.0, 1.0]
    pairs = [_pair(positions[i], audios[i], powers[i], f"{i}_0")
             for i in range(4)]

    n = len(pairs)
    mat = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            if i != j:
                mat[i, j] = si_sdr(audios[i], audios[j])

    _, final_host, _ = clustering_nms(pairs)
    _, final_mat, _ = clustering_nms(pairs, pair_sisdr=mat)
    assert [f[3] for f in final_host] == [f[3] for f in final_mat]


def test_check_sisnr_win_rules():
    assert check_sisnr_win([0.0, -3.0])          # one above -2, none below -7
    assert not check_sisnr_win([-3.0, -4.0])     # none above -2
    assert not check_sisnr_win([0.0, -8.0])      # one below -7
    assert not check_sisnr_win([])


def test_weight_mean_pos_threshold():
    patches = [Patch(np.full(6, i, dtype=float), [2.0] * 6, None,
                     peak_pos=np.array([float(i), 0.0, 0.3]))
               for i in range(3)]
    powers = [10.0, 9.0, 1.0]  # third is below 0.75 * head power
    pos, offs = weight_mean_pos(patches, powers, [0, 1, 2])
    # only the first two contribute
    expected_x = (10 * 0 + 9 * 1) / 19
    assert abs(pos[0] - expected_x) < 1e-9
    assert abs(offs[0] - expected_x) < 1e-9


def test_nms_max_out_cap(monkeypatch):
    from acousticswarms_speech_tpu.search import clustering
    rng = np.random.default_rng(2)
    # 8 mutually-independent voiced signals, far apart -> 8 clusters uncapped
    pairs = [_pair([1.0 + 2 * i, 1.0, 0.3], _voiced(rng), 9.0 - i, f"{i}_0")
             for i in range(8)]
    monkeypatch.setattr(clustering, "NMS_MAX_OUT", 3)
    _, final, _ = clustering_nms(pairs)
    assert len(final) == 3
    # power-ranked: the strongest heads survive the cap
    assert [f[3] for f in final] == ["0_0", "1_0", "2_0"]


def test_nms_sisdr_threshold_tunable(monkeypatch):
    from acousticswarms_speech_tpu.search import clustering
    rng = np.random.default_rng(3)
    a = _voiced(rng)
    # leaked copy: same signal + noise ~ 1 dB SI-SDR similarity
    leaked = a + 0.9 * np.asarray(_voiced(rng))
    pairs = [_pair([1.0, 1.0, 0.3], a, 2.0, "0_0"),
             _pair([4.0, 4.0, 0.3], leaked, 1.0, "1_0")]
    from acousticswarms_speech_tpu.utils.metrics import si_sdr
    sim = si_sdr(leaked, a)
    assert -7 < sim < 2  # in the contested band

    monkeypatch.setattr(clustering, "NMS_SISDR_THRESHOLD", -10.0)
    _, merged, _ = clustering_nms(pairs)
    assert len(merged) == 1
    monkeypatch.setattr(clustering, "NMS_SISDR_THRESHOLD", 10.0)
    monkeypatch.setattr(clustering, "NMS_WIN_THRESHOLD", 10.0)
    _, split, _ = clustering_nms(pairs)
    assert len(split) == 2
