"""End-to-end benchmark: mixtures/sec/chip for the 7-mic pipeline.

Measures the full localize-and-separate path (SRP-PHAT map -> coarse
spotforming -> fine spotforming -> clustering -> separation) on a fixed
synthetic 3 s, 5-speaker, 7-mic scene with full-size networks, excluding
one-time geometry setup and compilation per the reference's own protocol
(/root/reference/README.md:144).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "mixtures/s", "vs_baseline": r}

vs_baseline compares against bench_baseline.json when present (the recorded
reference-equivalent measurement); defaults to the raw value against 1.0.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
FIXTURE = os.path.join(REPO, ".bench_fixture_v2.npz")

MIC_POS = np.array([
    [3.0, 1.0, 0.02], [3.5, 1.3, 0.02], [3.5, 0.7, 0.02], [3.7, 1.0, 0.02],
    [3.3, 1.5, 0.02], [3.3, 0.5, 0.02], [3.6, 1.15, 0.02],
])
SRC_POS = [
    [4.8, 2.4, 0.4], [2.2, 3.4, 0.3], [5.4, 4.1, 0.5], [1.6, 1.9, 0.35],
    [3.1, 4.6, 0.45],
]
ROI = [1.0, 6.2, 0.2, 5.4, 0.1, 0.62]
DURATION_S = 3.0
REPEATS = int(os.environ.get("BENCH_REPEATS", "7"))


def build_fixture():
    """3 s, 5-speaker, 7-mic reverberant SPEECH scene (deterministic):
    formant-synthesized voices through the image-source simulator, so the
    bench's candidate/cluster counts track the real workload (round-1 used
    noise bursts; VERDICT round 1, weak #7)."""
    from acousticswarms_speech_tpu.constants import FS
    from acousticswarms_speech_tpu.data.roomsim import ShoeBox
    from acousticswarms_speech_tpu.data.voicegen import (
        SpeakerProfile,
        synthesize_utterance,
    )

    if os.path.exists(FIXTURE):
        z = np.load(FIXTURE)
        return z["mix"]
    T = int(DURATION_S * FS)
    room = ShoeBox([7.0, 6.0, 2.3], fs=FS, max_order=6, absorption=0.6)
    room.add_microphone_array(MIC_POS.T)
    for k, p in enumerate(SRC_POS):
        prof = SpeakerProfile(np.random.default_rng(100 + k))
        x = synthesize_utterance(prof, DURATION_S,
                                 np.random.default_rng(200 + k), FS)
        peak = np.abs(x).max()
        room.add_source(p, x / max(peak, 1e-6) * 0.7)
    mix = room.simulate(return_premix=True).sum(axis=0)[:, :T]
    np.savez_compressed(FIXTURE, mix=mix.astype(np.float32))
    return mix.astype(np.float32)


_CACHE_DIR = None
_CACHE_START = None


def _cache_entries():
    try:
        return len(os.listdir(_CACHE_DIR)) if _CACHE_DIR else 0
    except OSError:
        return 0


def cache_report() -> dict:
    """Persistent-compile-cache accounting for the bench artifact (VERDICT
    r4 #5: a 733 s driver warmup was un-diagnosable from the JSON).  Entries
    present at start ~ potential hits; entries added = programs compiled
    fresh this run (cache misses)."""
    return {"dir": _CACHE_DIR, "entries_at_start": _CACHE_START,
            "entries_added": _cache_entries() - (_CACHE_START or 0)}


def _enable_compilation_cache():
    """Persist XLA compiles across runs — the remote-compile TPU runtime in
    this environment takes minutes per program, so the cache is what makes
    repeated bench runs cheap."""
    import jax

    global _CACHE_DIR, _CACHE_START
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.join(REPO, ".jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _CACHE_DIR = cache_dir
    _CACHE_START = _cache_entries()


def _emit_error_json(reason: str) -> None:
    """Always leave a parseable bench line, even on failure — the driver
    records whatever this prints; an rc=1 with no JSON (BENCH_r03) is the
    worst outcome."""
    print(json.dumps({
        "metric": "e2e_7mic_mixtures_per_sec_per_chip",
        "value": 0.0,
        "unit": "mixtures/s",
        "vs_baseline": 0.0,
        "error": reason,
    }))


def _probe_tpu_alive() -> bool:
    """Bounded TPU-relay health probe in a subprocess.

    This environment's axon relay can go fully down mid-session; when it
    does, `jax.devices()` HANGS FOREVER in-process (no exception), so the
    probe must be an external process killed by timeout.  Retries with
    backoff ride out short flaps.
    """
    import subprocess

    tmo = int(os.environ.get("BENCH_PROBE_TIMEOUT_S", "120"))
    retries = int(os.environ.get("BENCH_PROBE_RETRIES", "3"))
    backoff = int(os.environ.get("BENCH_PROBE_BACKOFF_S", "60"))
    code = "import jax; d = jax.devices(); print(len(d))"
    for attempt in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code], timeout=tmo,
                capture_output=True, text=True,
            )
            if proc.returncode == 0:
                return True
            print(f"[bench] probe attempt {attempt + 1}/{retries} rc="
                  f"{proc.returncode}: {proc.stderr.strip()[-200:]}",
                  file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"[bench] probe attempt {attempt + 1}/{retries} timed out "
                  f"after {tmo}s (relay hang)", file=sys.stderr, flush=True)
        if attempt < retries - 1:
            time.sleep(backoff)
    return False


def main():
    if not _probe_tpu_alive():
        _emit_error_json("tpu backend unavailable: jax.devices() probe "
                         "failed/hung after retries (axon relay outage)")
        sys.exit(1)

    import jax
    import jax.numpy as jnp

    _enable_compilation_cache()

    from acousticswarms_speech_tpu.models import SepNet, SpotNet, init_model
    from acousticswarms_speech_tpu.pipeline.joint import JointPipeline

    t_setup0 = time.time()
    mix = build_fixture()

    # Full-size flagship configs.  Trained spotforming weights (when a dev
    # checkpoint exists) give representative candidate counts; otherwise the
    # deterministic random init is used.
    def _has_weights(d):
        return (os.path.isdir(os.path.join(d, "checkpoints"))
                or os.path.exists(os.path.join(d, "release",
                                               "params_f16.msgpack")))

    def _first_with_ckpts(*names):
        for n in names:
            d = os.path.join(REPO, "experiments", n)
            if _has_weights(d):
                return d
        return os.path.join(REPO, "experiments", names[0])

    spot_exp = os.environ.get("BENCH_SPOT_EXP") or _first_with_ckpts(
        "speech_localization", "speech_localization_stage1",
        "dev_localization")
    if _has_weights(spot_exp):
        from acousticswarms_speech_tpu.training.experiment import (
            load_model_from_exp,
        )

        spot, spot_params = load_model_from_exp(spot_exp, mode="best")
        weights_src = spot_exp
    else:
        spot = SpotNet()
        spot_params = init_model(
            spot, jax.random.PRNGKey(0),
            (jnp.zeros((1, 7, 256)), jnp.ones((1, 2))),
        )
        weights_src = "random-init"
    print(f"[bench] spot weights: {weights_src}", file=sys.stderr)
    sep_exp = os.environ.get("BENCH_SEP_EXP") or _first_with_ckpts(
        "speech_separation", "dev_separation")
    if _has_weights(sep_exp):
        from acousticswarms_speech_tpu.training.experiment import (
            load_model_from_exp,
        )

        sep, sep_params = load_model_from_exp(sep_exp, mode="best")
        print(f"[bench] sep weights: {sep_exp}", file=sys.stderr)
    else:
        sep = SepNet(max_speakers=5)
        sep_params = init_model(
            sep, jax.random.PRNGKey(1),
            (jnp.zeros((1, 35, 256)), jnp.asarray([2])),
        )
        print("[bench] sep weights: random-init", file=sys.stderr)

    batch = int(os.environ.get("BENCH_SPOT_BATCH", "64"))
    use_bf16 = os.environ.get("BENCH_BF16", "1") == "1"
    pipe = JointPipeline(spot, spot_params, sep, sep_params,
                         spot_batch_size=batch, use_bf16=use_bf16)
    print(f"[bench] models built at {time.time() - t_setup0:.1f}s",
          file=sys.stderr, flush=True)
    pipe.setup(MIC_POS, ROI, cache_dir=os.path.join(REPO, ".bench_cache"))
    print(f"[bench] geometry ready at {time.time() - t_setup0:.1f}s "
          f"(G={pipe.mic_processor.geom.num_clusters})",
          file=sys.stderr, flush=True)

    # Warmup (compiles every program; excluded per reference protocol)
    pipe.forward(mix)
    setup_time = time.time() - t_setup0
    print(f"[bench] warmup done at {setup_time:.1f}s; stage times "
          f"{['%.2f' % t for t in pipe.times]}", file=sys.stderr, flush=True)

    # Second warmup pass must be much faster than the first (all programs
    # compiled); if not, the compilation cache missed and timings would mix
    # compile time into the measurement.
    t0 = time.time()
    pipe.forward(mix)
    second = time.time() - t0
    assert second < setup_time, "warmup cache miss: second pass not faster"

    profile_dir = os.environ.get("BENCH_PROFILE_DIR")
    if profile_dir:
        # one profiled forward (excluded from timing): op-level trace for
        # finding the next kernel-level bottleneck
        pipe.forward(mix, profile_dir=profile_dir)
        print(f"[bench] profiler trace written to {profile_dir}",
              file=sys.stderr)

    times = []
    stage_times = []
    for _ in range(REPEATS):
        t0 = time.time()
        patches, audio_loc, audio, _, _, spot_calls = pipe.forward(mix)
        times.append(time.time() - t0)
        stage_times.append(list(pipe.times))
    elapsed = float(np.median(times))
    spread = (float(np.percentile(times, 75) - np.percentile(times, 25))
              if len(times) > 1 else 0.0)
    value = 1.0 / elapsed
    st = np.asarray(stage_times)  # (REPEATS, 5)
    stage_median = [round(float(x), 3) for x in np.median(st, axis=0)]
    stage_iqr = [round(float(x), 3) for x in
                 (np.percentile(st, 75, axis=0) - np.percentile(st, 25, axis=0))]
    # Per-stage variance makes a run-to-run spread attributable in the
    # artifact itself (VERDICT r4 weak #3: a 24% driver-vs-builder spread
    # with an anomalous stage-0 time had nothing in the JSON to explain it).
    # Rule of thumb: stage-0/3 inflation = host/relay contention; stage-1/2/4
    # inflation = device or relay-transfer contention.

    # Throughput mode (VERDICT r4 #4): the eval loop is embarrassingly
    # parallel across scenes; two pipeline lanes share the compiled
    # executors and overlap one scene's host stages (SRP peaks, subdivision,
    # NMS, consistency scoring) with the other's device sweeps.
    from acousticswarms_speech_tpu.pipeline.throughput import PipelinedRunner

    n_lanes = int(os.environ.get("BENCH_LANES", "2"))
    n_items = int(os.environ.get("BENCH_THROUGHPUT_ITEMS", str(max(REPEATS, 6))))
    tp_value = None
    lane_util = None
    if n_lanes > 1:
        runner = PipelinedRunner(
            pipe, n_lanes=n_lanes,
            setup_fn=lambda lane: lane.setup(
                MIC_POS, ROI, cache_dir=os.path.join(REPO, ".bench_cache")))
        # lane warmup (lane-2 geometry upload + any first-touch work)
        runner.run([mix] * n_lanes)
        _, tp_stats = runner.run([mix] * n_items)
        tp_value = tp_stats["mixtures_per_sec"]
        lane_util = [round(u, 2) for u in tp_stats["lane_utilization"]]

    baseline_path = os.path.join(REPO, "bench_baseline.json")
    vs_baseline = 1.0
    vs_a100_est = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get("value"):
            vs_baseline = value / base["value"]
        if base.get("a100_ref_equiv"):
            # Computed speed-of-light A100 estimate of the reference
            # pipeline (BASELINE.md "Computed A100-equivalent anchor").
            vs_a100_est = round(value / base["a100_ref_equiv"], 4)

    report_value = max(value, tp_value or 0.0)
    print(json.dumps({
        "metric": "e2e_7mic_mixtures_per_sec_per_chip",
        "value": round(report_value, 4),
        "unit": "mixtures/s",
        "vs_baseline": round(report_value / max(value, 1e-9)
                             * vs_baseline, 3),
        **({"vs_a100_est": round(report_value / max(value, 1e-9)
                                 * vs_a100_est, 4)}
           if vs_a100_est is not None else {}),
        "latency_mixtures_per_sec": round(value, 4),
        **({"throughput_mixtures_per_sec": round(tp_value, 4),
            "throughput_lanes": n_lanes,
            "lane_utilization": lane_util} if tp_value else {}),
        "stage_median_s": stage_median,
        "stage_iqr_s": stage_iqr,
        "per_mixture_iqr_s": round(spread, 3),
        "setup_warmup_s": round(setup_time, 1),
        "compile_cache": cache_report(),
    }))
    print(f"[bench] setup+warmup {setup_time:.1f}s; per-mixture {elapsed:.3f}s "
          f"= {DURATION_S / elapsed:.2f}x realtime on the {DURATION_S:.0f}s "
          f"scene (median of {REPEATS}, IQR {spread:.3f}s, "
          f"all {['%.2f' % t for t in times]}); "
          f"stage medians {stage_median} IQR {stage_iqr}; "
          f"throughput {tp_value and round(tp_value, 4)} ({n_lanes} lanes, "
          f"util {lane_util}); "
          f"clusters {len(patches)}; spot calls {spot_calls}; "
          f"batch {batch}; bf16 {use_bf16}; "
          f"crop {pipe.sweep_crop_seconds}s", file=sys.stderr)


if __name__ == "__main__":
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # noqa: BLE001 — always leave a JSON line
        import traceback

        traceback.print_exc()
        _emit_error_json(f"{type(e).__name__}: {e}"[:300])
        sys.exit(1)
