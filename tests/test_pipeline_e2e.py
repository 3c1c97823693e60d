"""End-to-end pipeline tests on simulated rooms.

Uses the in-repo image-source simulator (data/roomsim.py) as the reference
does with pyroomacoustics: ground-truth TDoAs are analytically known, so the
full localize-by-separation stack can be validated against closed-form
geometry without trained weights (the delay-and-sum spotformer provides the
power signal).
"""
import numpy as np
import pytest

from acousticswarms_speech_tpu.constants import FS, SPEED_OF_SOUND
from acousticswarms_speech_tpu.data.roomsim import ShoeBox, compute_rir, inverse_sabine
from acousticswarms_speech_tpu.pipeline.mic_array import MicArray
from acousticswarms_speech_tpu.search.spotform import DelayAndSumExecutor
from acousticswarms_speech_tpu.utils.shift import sample_offsets_for


MIC_POS = np.array([
    [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02], [3.7, 1.0, 0.02],
    [3.3, 1.5, 0.02], [3.3, 0.5, 0.02], [3.6, 1.15, 0.02],
])
ROOM = [7.0, 6.0, 2.3]


def _make_scene(src_positions, seed=0, duration=1.5, absorption=0.7,
                max_order=4):
    rng = np.random.default_rng(seed)
    T = int(duration * FS)
    room = ShoeBox(ROOM, fs=FS, max_order=max_order, absorption=absorption)
    room.add_microphone_array(MIC_POS.T)
    sigs = []
    for p in src_positions:
        # speech-ish: amplitude-modulated noise bursts
        x = rng.normal(size=T) * 0.3
        env = np.clip(np.sin(2 * np.pi * rng.uniform(1, 3) * np.arange(T) / FS
                             + rng.uniform(0, 6)), 0, None)
        sigs.append(x * env)
        room.add_source(p, x * env)
    premix = room.simulate(return_premix=True)
    gt = premix[:, :, :T]
    mix = premix.sum(axis=0)[:, :T]
    return mix, gt


def test_rir_direct_path_delay():
    src = np.array([4.0, 2.0, 0.3])
    mic = MIC_POS[0]
    rir = compute_rir(src, mic, np.array(ROOM), absorption=0.9, max_order=0,
                      fs=FS)
    d = np.linalg.norm(src - mic)
    expected_delay = d / SPEED_OF_SOUND * FS
    peak = np.argmax(np.abs(rir))
    assert abs(peak - expected_delay) < 2
    # amplitude ~ 1/(4 pi d)
    assert abs(np.max(np.abs(rir)) - 1 / (4 * np.pi * d)) < 0.2 / (4 * np.pi * d)


def test_inverse_sabine_reasonable():
    a, order = inverse_sabine(0.3, [7.0, 6.0, 2.3])
    assert 0 < a < 1 and order > 0


def test_simulated_tdoa_matches_geometry():
    """The simulator's direct-path TDoAs must match the analytic offsets —
    the property the reference relies on for GT labels
    (generate_dataset.py:504-510)."""
    src = np.array([5.0, 3.0, 0.4])
    offs = sample_offsets_for(src, MIC_POS, FS)[0]
    rirs = [compute_rir(src, MIC_POS[m], np.array(ROOM), 0.9, 0, FS)
            for m in range(7)]
    peaks = np.array([np.argmax(np.abs(r)) for r in rirs])
    got = peaks[1:] - peaks[0]
    np.testing.assert_allclose(got, offs, atol=1.0)


@pytest.mark.slow
def test_localize_by_separation_e2e_delay_and_sum():
    """Full stage 0-3 with the delay-and-sum spotformer on a 2-speaker
    simulated room: at least one cluster near each true source."""
    srcs = [np.array([4.8, 2.4, 0.4]), np.array([2.2, 3.4, 0.3])]
    mix, gt = _make_scene(srcs, seed=1)

    roi = [1.0, 6.0, 0.2, 5.0, 0.1, 0.62]
    arr = MicArray(MIC_POS, spk_range=roi, grid_size=0.05)
    spot = DelayAndSumExecutor(batch_size=64)

    patch_list, _ = arr.apply_srp_phat(mix)
    assert len(patch_list) > 0, "SRP produced no candidates"

    # GT containment: some candidate covers each source
    gt_offsets = sample_offsets_for(np.array(srcs), MIC_POS, FS).T  # (M-1, S)
    covered = [any(p.check_gt(gt_offsets[:, [s]]) for p in patch_list)
               for s in range(2)]
    assert all(covered), f"SRP candidates missed a source: {covered}"

    big = arr.spotform_big_patch(mix, patch_list, spot)
    assert len(big) > 0, "coarse spotforming dropped everything"

    pairs = arr.spotform_small_patch_parallel(mix, big, spot)
    assert len(pairs) > 0, "fine spotforming produced no clusters"

    audio_final, patch_final, spot_times, _ = arr.clustering_new(pairs)
    assert len(patch_final) >= 1
    assert spot_times > 0

    # Each final cluster should carry a position and audio of full length
    for pf in patch_final:
        center = pf[0].center_pos()
        assert center is not None and center.shape[0] == 3
        assert pf[1].shape[0] == mix.shape[1]

    # At least one cluster within 0.5 m of a true source
    centers = np.array([pf[0].center_pos()[:2] for pf in patch_final])
    dists = np.linalg.norm(
        centers[:, None, :] - np.array(srcs)[None, :, :2], axis=-1
    )
    assert dists.min() < 0.5, f"no cluster near any source: {dists}"


def test_crop_slice_picks_loudest_window():
    """JointPipeline._crop_slice: prefix-sum argmax of reference-channel
    energy, fixed length, off when crop >= T or crop seconds <= 0."""
    from types import SimpleNamespace

    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline

    T = 3 * FS
    mix = np.zeros((7, T), dtype=np.float32)
    mix[0, 100000:112000] = 1.0  # loud burst
    self_like = SimpleNamespace(sweep_crop_seconds=1.0)
    start, L = JointPipeline._crop_slice(self_like, mix)
    assert L == FS
    assert start <= 100000 and start + L >= 112000  # burst inside the crop

    self_like.sweep_crop_seconds = 0.0
    assert JointPipeline._crop_slice(self_like, mix) is None
    self_like.sweep_crop_seconds = 4.0  # longer than the mixture
    assert JointPipeline._crop_slice(self_like, mix) is None


@pytest.mark.slow
def test_cropped_selection_with_full_head_resweep():
    """Cropped-sweep mode (SPOT_CROP_SECONDS): stages 1-2 select on the
    loudest crop, cluster heads are re-spotformed full-T — final audio must
    be full-length and localization still lands near a true source."""
    srcs = [np.array([4.8, 2.4, 0.4]), np.array([2.2, 3.4, 0.3])]
    mix, gt = _make_scene(srcs, seed=1)
    T = mix.shape[1]

    roi = [1.0, 6.0, 0.2, 5.0, 0.1, 0.62]
    arr = MicArray(MIC_POS, spk_range=roi, grid_size=0.05)
    spot = DelayAndSumExecutor(batch_size=64)

    patch_list, _ = arr.apply_srp_phat(mix)
    assert len(patch_list) > 0

    crop_L = int(0.75 * FS)
    x2 = np.cumsum(mix[0].astype(np.float64) ** 2)
    sums = x2[crop_L - 1:] - np.concatenate([[0.0], x2[: T - crop_L]])
    s0 = int(np.argmax(sums))
    mix_crop = mix[:, s0 : s0 + crop_L]

    big = arr.spotform_big_patch(mix_crop, patch_list, spot)
    assert len(big) > 0
    pairs = arr.spotform_small_patch_parallel(mix_crop, big, spot,
                                              full_mix=mix)
    assert len(pairs) > 0
    audio_final, patch_final, spot_times, _ = arr.clustering_new(pairs)
    assert len(patch_final) >= 1

    for pf in patch_final:
        assert pf[1].shape[0] == T  # full-T audio despite cropped selection

    centers = np.array([pf[0].center_pos()[:2] for pf in patch_final])
    dists = np.linalg.norm(
        centers[:, None, :] - np.array(srcs)[None, :, :2], axis=-1)
    assert dists.min() < 0.5, f"no cluster near any source: {dists}"
