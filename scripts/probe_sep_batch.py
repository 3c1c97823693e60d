"""Measure separation train-step time + HBM at several batch sizes.

The separation recipe trains at batch 1 (PERF.md: '16 G HBM via 1.5 s
crops'), which leaves the MXU under-fed.  This probes whether batch 2/4
fits with remat on and what the per-sample step time does — if batch B
steps in < B x the batch-1 time, raising the batch is a free epochs/hour
multiplier for the round's main quality lever (separation training depth).

Usage: python scripts/probe_sep_batch.py [batch_sizes...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

from acousticswarms_speech_tpu.models.factory import create_model, init_model  # noqa: E402
from acousticswarms_speech_tpu.training.train import make_step_fns  # noqa: E402
from acousticswarms_speech_tpu.training.experiment import read_description  # noqa: E402


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    desc = read_description("experiments/speech_separation")
    model = create_model("SpeakerSeparation", desc["model_params"])
    sr = desc["sr"]
    tc = int(desc["train_set_params"]["crop_seconds"] * sr)
    n_mics = desc["model_params"]["n_mics"]
    n_spk = desc["model_params"]["max_speakers"]

    rng = np.random.default_rng(0)
    params = init_model(model, jax.random.PRNGKey(0),
                        (np.zeros((1, n_mics * n_spk, tc), np.float32),
                         np.array([n_spk])))
    import optax
    optimizer, train_step, _ = make_step_fns(
        model, "SpeakerSeparation", desc["training_params"]["loss"],
        desc["training_params"]["gradient_clip"])
    opt_state = optimizer.init(params)

    dev = jax.devices()[0]
    for B in sizes:
        data = rng.standard_normal((B, n_mics * n_spk, tc)).astype(np.float32) * 0.1
        gt = rng.standard_normal((B, n_spk, tc)).astype(np.float32) * 0.1
        ns = np.full((B,), n_spk, np.int32)
        batch = tuple(jax.device_put(x) for x in (data, gt, ns))
        try:
            t0 = time.perf_counter()
            p2, o2, loss = train_step(params, opt_state, batch)
            jax.block_until_ready(loss)
            compile_s = time.perf_counter() - t0
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                p2, o2, loss = train_step(params, opt_state, batch)
                jax.block_until_ready(loss)
                ts.append(time.perf_counter() - t0)
            step = min(ts)
            try:
                stats = dev.memory_stats()
                peak = stats.get("peak_bytes_in_use", 0) / 1e9
            except Exception:
                peak = float("nan")
            print(f"B={B}: step {step:.3f}s ({step/B:.3f}s/sample), "
                  f"compile {compile_s:.1f}s, peak HBM {peak:.2f} GB",
                  flush=True)
            del p2, o2
        except Exception as e:
            print(f"B={B}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
