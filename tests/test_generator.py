"""Dataset-generator scene sampling: desk placement, speaker keepout, ROI."""
import numpy as np

from acousticswarms_speech_tpu.data.generate_dataset import (
    calculate_sample_offset,
    colocated_array,
    get_random_mic_positions_desk,
    get_random_speaker_positions,
    is_valid_mic_array,
)


def test_desk_mic_placement_valid():
    np.random.seed(0)
    for _ in range(10):
        mic, desk, wall = get_random_mic_positions_desk(7, 0, 7.0, 0, 6.0)
        assert mic.shape == (7, 3)
        assert 0 <= wall < 4
        assert is_valid_mic_array(mic[:, :2], 0, 7.0, 0, 6.0)
        # robots expanded from the desk center: all within ~desk radius + dev
        d = np.linalg.norm(mic[1:, :2] - mic[0, :2], axis=1)
        assert np.all(d < max(desk) + 0.3)
        # all at robot height
        assert np.allclose(mic[:, 2], 0.02)


def test_speaker_positions_respect_keepout():
    np.random.seed(1)
    mic, desk, wall = get_random_mic_positions_desk(7, 0, 7.0, 0, 6.0)
    voices, offsets, roi = get_random_speaker_positions(
        4, mic, wall, left=0, right=7.0, up=6.0, down=0
    )
    assert len(voices) == 4 and len(offsets) == 4
    mnx, mny = mic[:, 0].min() - 0.25, mic[:, 1].min() - 0.25
    mxx, mxy = mic[:, 0].max() + 0.25, mic[:, 1].max() + 0.25
    for v in voices:
        # outside the desk keepout box
        inside = (mnx <= v[0] <= mxx) and (mny <= v[1] <= mxy)
        assert not inside
        # inside the ROI
        assert roi[0] <= v[0] <= roi[1] and roi[2] <= v[1] <= roi[3]
    # pairwise min distance
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.linalg.norm(np.asarray(voices[i]) - voices[j]) >= 0.51


def test_offsets_match_shift_math():
    from acousticswarms_speech_tpu.utils.shift import sample_offsets_for

    np.random.seed(2)
    mic, _, wall = get_random_mic_positions_desk(7, 0, 7.0, 0, 6.0)
    pos = np.array([4.0, 3.0, 0.4])
    off = calculate_sample_offset(mic, pos, 48000)
    ref = sample_offsets_for(pos, mic, 48000)[0]
    np.testing.assert_allclose(off, ref, atol=1e-9)


def test_colocated_array_geometry():
    np.random.seed(3)
    arr = colocated_array(np.array([3.0, 3.0]), 7)
    assert arr.shape == (7, 3)
    r = np.linalg.norm(arr[:, :2] - np.array([3.0, 3.0]), axis=1)
    np.testing.assert_allclose(r, 0.05, atol=1e-9)  # Echo-Dot radius


def test_three_desks_geometry():
    from acousticswarms_speech_tpu.data.generate_dataset import (
        THREE_DESK_SIZES,
        get_random_mic_positions_three_desks,
    )

    np.random.seed(2)
    for _ in range(5):
        placed, dims, wall = get_random_mic_positions_three_desks(
            7, 0, 7.0, 0, 6.0)
        assert set(placed) == {"large", "middle", "small"}
        assert 0 <= wall < 4
        # co-centered: mic 0 (the desk center) is identical across sizes
        np.testing.assert_allclose(placed["large"][0], placed["middle"][0])
        np.testing.assert_allclose(placed["large"][0], placed["small"][0])
        ranges = {name: (lr, wr) for name, lr, wr in THREE_DESK_SIZES}
        spans = {}
        for name, mic in placed.items():
            assert mic.shape == (7, 3)
            assert is_valid_mic_array(mic[:, :2], 0, 7.0, 0, 6.0)
            assert np.allclose(mic[:, 2], 0.02)
            lr, wr = ranges[name]
            assert lr[0] <= dims[name][0] <= lr[1]
            assert wr[0] <= dims[name][1] <= wr[1]
            spans[name] = np.linalg.norm(
                mic[1:, :2] - mic[0, :2], axis=1).mean()
        # expansion extent ordered by desk size
        assert spans["large"] > spans["middle"] > spans["small"]


def test_three_desks_end_to_end(tmp_path):
    import json
    import subprocess
    import sys

    # tiny voice bank (2 clips x 3 speakers) then one scene per split
    from acousticswarms_speech_tpu.data.voicegen import generate_voice_bank

    bank = tmp_path / "bank"
    generate_voice_bank(str(bank), n_speakers=5, clips_per_speaker=1,
                        duration=0.5, seed=1)
    out = tmp_path / "ds"
    r = subprocess.run([
        sys.executable, "-m",
        "acousticswarms_speech_tpu.data.generate_dataset", str(bank),
        str(out), "--n_outputs_train", "1", "--n_outputs_test", "0",
        "--n_outputs_val", "0", "--n_voices_min", "2", "--n_voices_max", "2",
        "--duration", "0.5", "--max_order", "2", "--generate_three_desks",
        "--seed", "3",
    ], capture_output=True, text=True)
    assert r.returncode == 0, r.stderr[-2000:]
    metas = {}
    for size in ("large", "middle", "small"):
        d = out / size / "train" / "00000"
        assert (d / "metadata.json").exists(), f"missing {size}"
        with open(d / "metadata.json") as f:
            metas[size] = json.load(f)
    # same room/speakers across sizes, desk sizes ordered, mics differ
    assert metas["large"]["Room_dimensions"] == metas["small"][
        "Room_dimensions"]
    assert metas["large"]["voice00"]["position"] == metas["small"][
        "voice00"]["position"]
    assert metas["large"]["Desk_size"][0] > metas["small"]["Desk_size"][0]
    assert metas["large"]["mic01"]["position"] != metas["small"]["mic01"][
        "position"]
