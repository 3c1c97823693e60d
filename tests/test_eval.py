"""Eval driver, metrics, analyzer and checkpoint-converter tests."""
import json
import os

import numpy as np
import pytest

from acousticswarms_speech_tpu.utils.bss_eval import bss_eval_sources
from acousticswarms_speech_tpu.pipeline.evaluate import (
    compute_metrics,
    find_best_permutation,
    preprocess_metadata,
)


def test_bss_eval_identity_and_mixture():
    rng = np.random.default_rng(0)
    s1 = rng.normal(size=20000)
    s2 = rng.normal(size=20000)
    ref = np.stack([s1, s2])

    # perfect estimates -> very high SDR
    sdr, sir, sar, perm = bss_eval_sources(ref, ref, compute_permutation=False)
    assert np.all(sdr > 40)

    # estimates contaminated with the other source -> finite, low SIR
    est = np.stack([s1 + 0.5 * s2, s2 + 0.5 * s1])
    sdr2, sir2, sar2, _ = bss_eval_sources(ref, est, compute_permutation=False)
    assert np.all(sdr2 < sdr)
    assert np.all(sir2 < 20)

    # permutation recovery
    sdr3, _, _, perm3 = bss_eval_sources(ref, ref[::-1],
                                         compute_permutation=True)
    assert list(perm3) == [1, 0]
    assert np.all(sdr3 > 40)


def test_find_best_permutation():
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(2, 8000))
    pos_gt = np.array([[1.0, 1.0, 0.3], [3.0, 2.0, 0.4]])
    # predictions: swapped order, plus one false positive
    pred = np.stack([gt[1] + 0.01 * rng.normal(size=8000),
                     gt[0] + 0.01 * rng.normal(size=8000),
                     rng.normal(size=8000)])
    pos_pred = np.array([[3.1, 2.0, 0.4], [1.05, 1.0, 0.3], [5.0, 5.0, 0.3]])
    perm = find_best_permutation(gt, pred, pos_gt, pos_pred)
    assert sorted(perm) == [(0, 1), (1, 0)]


def test_preprocess_metadata_offsets():
    mics = {f"mic{i:02d}": {"position": [3.0 + 0.1 * i, 1.0, 0.02]}
            for i in range(7)}
    metadata = dict(mics)
    metadata["voice00"] = {"position": [5.0, 2.0, 0.4]}
    metadata["ROI"] = [1, 6, 0, 5, 0.1, 0.6]
    out = preprocess_metadata(metadata)
    mic_positions, sample_offsets_gt = out[1], out[4]
    assert mic_positions.shape == (7, 3)
    assert sample_offsets_gt.shape == (6, 1)
    # mic06 is closer to the voice than mic00 -> negative offset
    assert sample_offsets_gt[5, 0] < 0


def test_convert_state_dict_loc_roundtrip():
    """Build a synthetic torch-style state dict with reference names for a
    tiny SpotNet config, convert, and run the flax model with it."""
    import jax
    import jax.numpy as jnp

    from acousticswarms_speech_tpu.models import SpotNet
    from acousticswarms_speech_tpu.models.convert import convert_state_dict

    cfg = dict(n_mics=4, kernel_size=7, stride_list=(2, 2), channels=4,
               growth=2, encoder_channels=8, encoder_kernel_size=33,
               encoder_stride=16, residual_layers=2,
               residual_dilation_factor=2, num_head=2, ffw_dim=8,
               num_transformer_layers=1)
    model = SpotNet(**cfg)
    x = jnp.zeros((1, 4, 128))
    w = jnp.ones((1, 2))
    ref_params = model.init(jax.random.PRNGKey(0), x, w)

    # flatten our params into reference torch names
    def to_torch_names(tree):
        rules = {
            "preproc": "preproc", "reference_bypass": "reference_bypass",
            "mask_encoder": "mask_encoder", "output_decoder": "output_decoder",
        }
        sd = {}

        def walk(node, path):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(v, path + [k])
                return
            name = None
            p = path
            if p[0] in rules:
                name = f"{rules[p[0]]}.{p[-1]}"
            elif p[0].startswith("encoder_"):
                i = p[0].split("_")[1]
                if p[1] == "res":
                    j = p[2].split("_")[1]
                    name = f"encoder.module_list.{i}.res.seq.{j}.{p[3]}.{p[4]}"
                else:
                    name = f"encoder.module_list.{i}.{p[1]}.{p[2]}"
            elif p[0].startswith("decoder_"):
                i = p[0].split("_")[1]
                if p[1] == "res":
                    j = p[2].split("_")[1]
                    name = f"decoder.module_list.{i}.res.seq.{j}.{p[3]}.{p[4]}"
                elif p[1] == "upsample_conv":
                    name = f"decoder.module_list.{i}.upsample.conv.{p[2]}"
                else:
                    name = f"decoder.module_list.{i}.{p[1]}.{p[2]}"
            elif p[0] == "bottleneck":
                i = p[1].split("_")[1]
                rest = ".".join(p[2:])
                rest = rest.replace("out_proj.weight", "out_proj.weight") \
                    if "out_proj" in rest else rest
                name = f"bottleneck.transf.layers.{i}.{rest}"
            assert name is not None, p
            sd[name] = np.asarray(node)

        walk(tree["params"], [])
        return sd

    sd = to_torch_names(ref_params)
    converted, unmatched = convert_state_dict(sd, "SpeakerLocalization")
    assert unmatched == [], unmatched

    rng = np.random.default_rng(0)
    xin = jnp.asarray(rng.normal(size=(1, 4, 128)).astype(np.float32))
    y_ref = model.apply(ref_params, xin, w)
    y_conv = model.apply(converted, xin, w)
    np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_conv))


def test_analyzer_reads_result_json(tmp_path):
    from acousticswarms_speech_tpu.pipeline.analyze import analyze

    result = {
        "gt": [{"sample": [0] * 6, "pos": [1, 1, 0.3]},
               {"sample": [0] * 6, "pos": [3, 2, 0.4]}],
        "pred": [{
            "voice_id": 0, "shifts": [0] * 6, "pos": [1.1, 1.0, 0.3],
            "sample_err": 1.0, "dis_err": 0.1, "si_snr_in_mir": 0.0,
            "si_snri_mir": 5.0, "si_snr_in": 0.0, "si_snri": 6.0,
            "si_snr_in_old": 0.0, "si_snri_old": 4.0,
        }],
        "false_positive": [{"pos": [5, 5, 0.3], "sample": [0] * 6}],
    }
    with open(tmp_path / "result_00000.json", "w") as f:
        json.dump(result, f)
    out = analyze(str(tmp_path), verbose=False)
    assert out["tp"] == 1 and out["fp"] == 1 and out["fn"] == 1
    assert out["precision"] == 0.5 and out["recall"] == 0.5
    assert out["loc_err_median"] == pytest.approx(0.1)
    assert 2 in out["per_speaker_count"]


def test_on_the_fly_gt_denoising(tmp_path):
    """Real-recording scenes get their GT denoised (and cached) during eval:
    get_items(generate_denoised=True) writes *_denoised.wav and returns a GT
    with higher SNR than the noisy original."""
    from acousticswarms_speech_tpu.pipeline.evaluate import get_items
    from acousticswarms_speech_tpu.utils import write_wav

    sr = 48000
    rng = np.random.default_rng(0)
    t = np.arange(2 * sr) / sr
    clean = (np.sin(2 * np.pi * 220 * t) * (np.sin(2 * np.pi * 1.5 * t) > 0.2)
             ).astype(np.float32) * 0.4
    clean[: sr // 2] = 0.0  # quiet head: the noise-floor estimate window
    noise = rng.normal(size=clean.shape).astype(np.float32) * 0.02
    noisy = clean + noise

    d = tmp_path / "00000"
    d.mkdir()
    write_wav(str(d / "mic00_voice00.wav"), noisy, sr)
    write_wav(str(d / "mic00_mixed.wav"), noisy, sr)
    meta = {
        "voice00": {"position": [1, 1, 0.3], "shifts": [], "speaker_id": "a"},
        "mic00": {"position": [0, 0, 0.02]},
        "real": True,
    }
    (d / "metadata.json").write_text(json.dumps(meta))

    _, _, gt = get_items(str(d), denoise_gt=True, generate_denoised=True,
                         sr=sr)
    assert os.path.exists(d / "mic00_voice00_denoised.wav")

    def snr(x):
        n = min(len(x), len(clean))
        e_sig = np.sum(clean[:n] ** 2)
        e_err = np.sum((x[:n] - clean[:n]) ** 2)
        return 10 * np.log10(e_sig / (e_err + 1e-12))

    assert snr(gt[0]) > snr(noisy) + 3.0, (snr(gt[0]), snr(noisy))

    # synthetic scenes (real=False) must NOT be touched
    meta["real"] = False
    d2 = tmp_path / "00001"
    d2.mkdir()
    write_wav(str(d2 / "mic00_voice00.wav"), noisy, sr)
    write_wav(str(d2 / "mic00_mixed.wav"), noisy, sr)
    (d2 / "metadata.json").write_text(json.dumps(meta))
    get_items(str(d2), denoise_gt=True, generate_denoised=True, sr=sr)
    assert not os.path.exists(d2 / "mic00_voice00_denoised.wav")


def test_degrade_mixture_robot_proxy():
    """Robot-condition proxy (VERDICT r2 #7): deterministic per seed, adds
    bounded noise + per-mic timing jitter, keeps the reference mic unshifted,
    and never touches its input."""
    from acousticswarms_speech_tpu.pipeline.evaluate import degrade_mixture

    rng = np.random.default_rng(7)
    t = np.arange(9600)
    mix = np.stack([np.sin(2 * np.pi * 440 * t / 48000 + p)
                    for p in np.linspace(0, 1, 4)]).astype(np.float32)
    mix += 0.01 * rng.normal(size=mix.shape).astype(np.float32)
    orig = mix.copy()

    d1 = degrade_mixture(mix, seed=123)
    d2 = degrade_mixture(mix, seed=123)
    d3 = degrade_mixture(mix, seed=124)
    np.testing.assert_array_equal(mix, orig)          # input untouched
    np.testing.assert_array_equal(d1, d2)             # deterministic
    assert not np.array_equal(d1, d3)                 # seed-sensitive
    assert d1.dtype == np.float32

    # jitter applies to non-reference mics only; recoverable by cross-corr
    dj = degrade_mixture(mix, seed=5, white_noise_variance=0.0,
                         pink_noise_variance=0.0, shift_jitter=2, codec=None)
    np.testing.assert_allclose(dj[0], mix[0], atol=1e-6)
    for i in range(1, mix.shape[0]):
        best = max(range(-2, 3),
                   key=lambda s: float(np.dot(dj[i], np.roll(mix[i], s))))
        np.testing.assert_allclose(dj[i], np.roll(mix[i], best), atol=1e-6)

    # noise level is bounded by the configured variances
    dn = degrade_mixture(mix, seed=9, shift_jitter=0, codec=None)
    err = dn - mix
    assert np.sqrt(np.mean(err ** 2)) < 0.02


def test_bootstrap_ci(tmp_path):
    """CIs must bracket the point estimate and shrink with more scenes."""
    import json as _json

    from acousticswarms_speech_tpu.pipeline.analyze import analyze, bootstrap_ci

    rng = np.random.default_rng(0)

    def write(n, d):
        for i in range(n):
            r = {"gt": [{}] * 3,
                 "pred": [{"dis_err": float(rng.uniform(0.1, 0.5)),
                           "si_snri": float(rng.normal(4, 1)),
                           "sample_err": 1.0, "si_snr_in": 0.0,
                           "si_snr_in_mir": 0.0, "si_snri_mir": 4.0,
                           "si_snr_in_old": 0.0, "si_snri_old": 3.0}] * 2,
                 "false_positive": [{}] * (i % 2)}
            (d / f"result_{i:05d}.json").write_text(_json.dumps(r))

    small, big = tmp_path / "small", tmp_path / "big"
    small.mkdir(); big.mkdir()
    write(8, small); write(200, big)

    for d in (small, big):
        pt = analyze(str(d), verbose=False)
        ci = bootstrap_ci(str(d), n_boot=300)
        assert ci["precision"][0] <= pt["precision"] <= ci["precision"][1]
        assert ci["recall"][0] <= pt["recall"] <= ci["recall"][1]

    w_small = np.diff(bootstrap_ci(str(small), n_boot=300)["precision"])[0]
    w_big = np.diff(bootstrap_ci(str(big), n_boot=300)["precision"])[0]
    assert w_big < w_small


def test_eval_cli_multi_shard_one_process(monkeypatch):
    """--shard_indices runs several shards (and optional degraded passes)
    inside ONE process, so the remote-compile cost is paid once."""
    from acousticswarms_speech_tpu.pipeline import evaluate as ev

    calls = []

    def fake_eval(model, dataset, results_folder=None, cache_geometry=False,
                  shard_index=0, num_shards=1, degrade=False, **kw):
        calls.append((shard_index, num_shards, degrade, results_folder))
        return {"tp": 0, "fp": 0, "fn": 0}

    class _FakePipe:
        @staticmethod
        def from_experiments(*a, **k):
            return object()

    monkeypatch.setattr(ev, "evaluate_dataset", fake_eval)
    import acousticswarms_speech_tpu.pipeline.joint as joint

    monkeypatch.setattr(joint, "JointPipeline", _FakePipe)
    monkeypatch.setattr(
        "sys.argv",
        ["evaluate", "ds", "--spot_experiment_dir", "x",
         "--sep_experiment_dir", "y", "--num_shards", "3",
         "--shard_indices", "0,1,2", "--results_folder", "res",
         "--degrade_shard_indices", "1"])
    ev.main()

    assert calls == [
        (0, 3, False, "res"), (1, 3, False, "res"), (2, 3, False, "res"),
        (1, 3, True, "res_degraded"),
    ]


def test_eval_writes_effective_config(tmp_path):
    """ADVICE r3: result folders must record the effective (env-overridable)
    threshold configuration for provenance."""
    from acousticswarms_speech_tpu.pipeline.evaluate import evaluate_dataset

    ds = tmp_path / "ds"
    ds.mkdir()
    rf = tmp_path / "res"
    out = evaluate_dataset(object(), str(ds), results_folder=str(rf))
    assert out == {"tp": 0, "fp": 0, "fn": 0}
    with open(rf / "config.json") as f:
        cfg = json.load(f)
    from acousticswarms_speech_tpu import constants as C
    from acousticswarms_speech_tpu.search import clustering as cl

    assert cfg["SPOT_POWER_THRESHOLD1"] == C.SPOT_POWER_THRESHOLD1
    assert cfg["SPOT_POWER_THRESHOLD2"] == C.SPOT_POWER_THRESHOLD2
    assert cfg["NMS_SISDR_THRESHOLD"] == cl.NMS_SISDR_THRESHOLD
    assert cfg["NMS_MAX_OUT"] == cl.NMS_MAX_OUT
    assert cl.NMS_MAX_OUT > 6  # strictly above the eval sets' max GT count
