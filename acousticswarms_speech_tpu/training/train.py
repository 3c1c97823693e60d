"""Training driver: experiment-dir driven, resumable, plateau-scheduled.

Counterpart of /root/reference/sep/training/train.py and the per-model
train_epoch/test_epoch loops (SpeakerLocalization/train.py,
SpeakerSeparation/train.py), rebuilt on optax:

- description.json selects the model, loss, lr schedule and dataset params
  (same schema as the reference's experiments/*/description.json)
- one jitted train step: normalize -> forward -> unnormalize -> loss ->
  global-norm clip -> adam update
- per-epoch msgpack checkpoints with auto-resume from the latest epoch and
  optional warm start from `pretrain_path`
- ReduceLROnPlateau on the validation loss
- deterministic seeding: per-epoch reseed for training, fixed VAL_SEED for
  validation (reference train.py:24-30, 93-103)
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.common import normalize_input, unnormalize_input
from ..models.factory import create_model, init_model, param_count
from ..utils.misc import seed_all
from . import checkpoints as ckpt
from .datasets import BatchLoader, LocalizationDataset, SeparationDataset
from .experiment import read_description
from .losses import get_loss_fn, neg_sdr
from .schedulers import ReduceLROnPlateau

VAL_SEED = 0

# The axon relay client leaks every H2D transfer's payload in host RSS
# (measured: ~payload MB leaked per device_put, unrecoverable by gc).  Two
# mitigations: large float32 batch tensors are shipped as int16 + scale
# (Quantized, halves the leak and the slow-relay transfer time; the
# 2^-15 full-scale quantization step is ~-90 dB, far below the -30 dB
# training noise floor), and the epoch loop exits with code 75 when RSS
# crosses ACOUSTIC_RSS_EXIT_GB so scripts/train_until_done.sh can restart
# the process (auto-resume continues from the last epoch).
RSS_EXIT_CODE = 75
_RSS_EXIT_GB = float(os.environ.get("ACOUSTIC_RSS_EXIT_GB", "80"))
_QUANT_MIN_BYTES = 1 << 20


class Quantized(NamedTuple):
    """A float32 tensor shipped host->device as int16 plus a scale."""
    q: jnp.ndarray
    scale: jnp.ndarray


def _quantize_host(x: np.ndarray) -> Quantized:
    scale = np.float32(max(float(np.max(np.abs(x))), 1e-30) / 32767.0)
    q = np.clip(np.round(x * (1.0 / scale)), -32768, 32767).astype(np.int16)
    return Quantized(q, scale)


def _dequant(b):
    if isinstance(b, Quantized):
        return b.q.astype(jnp.float32) * b.scale
    return b


def _rss_gb() -> float:
    try:
        with open("/proc/self/statm") as f:
            return (int(f.read().split()[1])
                    * os.sysconf("SC_PAGE_SIZE") / 1e9)
    except OSError:
        return 0.0


DATASET_REGISTRY = {
    "SpeakerLocalization": LocalizationDataset,
    "SpeakerSeparation": SeparationDataset,
}


def _device_perturb(key, data, max_white_var: float, max_pink_var: float):
    """Device-side port of BaseDataset.perturb_audio: per-item scalar noise
    levels, unit-variance pink + white noise added to the (B, C, T) input
    stack.  Runs inside the jitted train step — the host version costs
    ~0.4-1.1 s per item on the single data-prep core and was the measured
    training-throughput bottleneck (the TPU step itself is ~10 ms)."""
    from ..utils.pink_noise import powerlaw_psd_gaussian_jax

    kl, kp, kw = jax.random.split(key, 3)
    levels = jax.random.uniform(kl, (2, data.shape[0]) + (1,) * (data.ndim - 1),
                                jnp.float32)
    pink = powerlaw_psd_gaussian_jax(1, data.shape, kp)
    white = jax.random.normal(kw, data.shape, jnp.float32)
    return (data + levels[0] * max_pink_var * pink
            + levels[1] * max_white_var * white)


def make_step_fns(model, model_name: str, loss_name: str,
                  gradient_clip: float, perturb: tuple | None = None,
                  base_seed: int = 0):
    """Build the jitted train/eval steps.

    When ``perturb = (max_white_var, max_pink_var)`` is given, the train
    step applies the noise augmentation on device from a per-step PRNG key
    derived from ``base_seed`` and the host-supplied step counter (the
    datasets then skip their host-side perturb_audio)."""
    loss_fn = get_loss_fn(loss_name)

    def compute_loss(params, batch, step=None):
        batch = tuple(_dequant(b) for b in batch)
        if step is not None:
            key = jax.random.fold_in(jax.random.PRNGKey(base_seed), step)
            batch = (_device_perturb(key, batch[0], *perturb),) + batch[1:]
        if model_name == "SpeakerLocalization":
            data, gt, window = batch
            normed, means, stds = normalize_input(data)
            out = model.apply(params, normed, window)
            out = unnormalize_input(out, means, stds)
            return loss_fn(out, gt)
        else:
            data, gt, n_spk = batch
            normed, means, stds = normalize_input(data)
            out = model.apply(params, normed, n_spk)  # (B, S, T)
            out = unnormalize_input(out, means, stds)
            B, S, T = out.shape
            return loss_fn(out.reshape(B * S, 1, T), gt.reshape(B * S, 1, T))

    optimizer = optax.inject_hyperparams(optax.adam)(learning_rate=1e-3)
    clipper = optax.clip_by_global_norm(gradient_clip)

    @jax.jit
    def train_step(params, opt_state, batch, step=None):
        loss, grads = jax.value_and_grad(compute_loss)(params, batch, step)
        grads, _ = clipper.update(grads, optax.EmptyState())
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    @jax.jit
    def eval_step(params, batch):
        return compute_loss(params, batch)

    return optimizer, train_step, eval_step


def _device_prefetch(iterable, depth: int = 2):
    """Double-buffer host batches onto the device.

    `jax.device_put` enqueues an async H2D copy; by keeping `depth` batches
    in flight, the (slow-relay) transfer of batch k+1 overlaps the compute
    of batch k instead of serializing in front of it.  Yields tuples of
    device arrays in the original order.  Bounded: at most `depth` batches
    of device memory beyond the one being consumed."""
    from collections import deque

    q: deque = deque()
    it = iter(iterable)

    def enqueue(b):
        out = []
        for x in b:
            if (isinstance(x, np.ndarray) and x.dtype == np.float32
                    and x.nbytes >= _QUANT_MIN_BYTES):
                qz = _quantize_host(x)
                out.append(Quantized(jax.device_put(qz.q),
                                     jax.device_put(qz.scale)))
            else:
                out.append(jax.device_put(jnp.asarray(x)))
        q.append(tuple(out))

    for b in it:
        enqueue(b)
        if len(q) > depth:
            yield q.popleft()
    while q:
        yield q.popleft()


def _sisdr_metrics(model, model_name, params, batch):
    """Validation SI-SDR metrics on positive samples (reference
    SpeakerLocalization/train.py:15-46)."""
    if model_name == "SpeakerLocalization":
        data, gt, window = batch
        normed, means, stds = normalize_input(jnp.asarray(data))
        out = unnormalize_input(model.apply(params, normed, jnp.asarray(window)),
                                means, stds)
        est, ref = np.asarray(out)[:, 0], gt[:, 0]
        orig = data[:, 0]
    else:
        data, gt, n_spk = batch
        normed, means, stds = normalize_input(jnp.asarray(data))
        out = unnormalize_input(model.apply(params, normed, jnp.asarray(n_spk)),
                                means, stds)
        B, S, T = out.shape
        est = np.asarray(out).reshape(B * S, T)
        ref = gt.reshape(B * S, T)
        orig = np.repeat(data[:, 0:1], S, axis=1).reshape(B * S, T)
    idx = np.flatnonzero(np.abs(ref).max(axis=1) > 0)
    if idx.size == 0:
        return []
    # Two batched dispatches for the whole masked set (a per-item loop here
    # cost one device round-trip per sample at reference-scale validation).
    ref_m = jnp.asarray(np.asarray(ref)[idx])
    in_sisdr = -np.asarray(neg_sdr(jnp.asarray(np.asarray(orig)[idx]),
                                   ref_m, "sisdr"))
    out_sisdr = -np.asarray(neg_sdr(jnp.asarray(np.asarray(est)[idx]),
                                    ref_m, "sisdr"))
    return [{"input_si_sdr": float(a), "si_sdr": float(b)}
            for a, b in zip(in_sisdr, out_sisdr)]


def train(experiment_dir: str, seed: int = 0, print_interval: int = 20,
          max_steps_per_epoch: int | None = None,
          compute_val_metrics: bool = False):
    seed_all(seed)
    desc = read_description(experiment_dir)
    model_name = desc["model_name"]
    model_params = desc["model_params"]
    training_params = desc["training_params"]
    lr_sched_params = desc["lr_sched_params"]
    sr = desc["sr"]

    train_set_params = dict(desc["train_set_params"], sr=sr)
    test_set_params = dict(desc["test_set_params"], sr=sr)

    experiment_name = os.path.basename(experiment_dir.rstrip("/"))
    checkpoints_dir = os.path.join(experiment_dir, "checkpoints")
    os.makedirs(checkpoints_dir, exist_ok=True)

    ds_cls = DATASET_REGISTRY[model_name]
    data_train = ds_cls(dataset_type="train", **train_set_params)
    data_test = ds_cls(dataset_type="test", **test_set_params)
    train_loader = BatchLoader(data_train, training_params["batch_size"],
                               shuffle=True, seed=seed)
    test_loader = BatchLoader(data_test, training_params["batch_size"])

    model = create_model(model_name, model_params)
    params = init_model(model, jax.random.PRNGKey(seed),
                        _example_inputs_for(model_name, model_params))
    print(f"Model has {param_count(params) / 1e6:.02f}M parameters.")

    # Device-side noise augmentation: same distribution as the host
    # perturb_audio but runs inside the jitted step (the host version was
    # the measured epoch bottleneck on a single data-prep core).  Only when
    # the codec augmentation is off — the reference order is
    # perturb-then-codec, which a device-side perturb cannot preserve.
    perturb = None
    if (os.environ.get("ACOUSTIC_DEVICE_PERTURB", "1") != "0"
            and float(train_set_params.get("compression_prob", 0.7)) == 0):
        perturb = (float(data_train.max_white_noise_variance),
                   float(data_train.max_pink_noise_variance))
        data_train.perturb_on_device = True
        print("Device-side perturb: on "
              f"(white {perturb[0]:g}, pink {perturb[1]:g})")

    optimizer, train_step, eval_step = make_step_fns(
        model, model_name, training_params["loss"],
        training_params["gradient_clip"], perturb=perturb, base_seed=seed,
    )

    # Resume / warm start (reference train.py:117-137)
    latest = ckpt.latest_checkpoint(checkpoints_dir, experiment_name)
    start_epoch = 0
    if latest is not None:
        start_epoch = latest[0] + 1
        params = ckpt.load_params(latest[1], params)
        print(f"Resumed from epoch {latest[0]}")
    elif "pretrain_path" in training_params:
        pre = training_params["pretrain_path"]
        if pre.endswith(".pt"):
            from ..models.convert import convert_state_dict, load_torch_checkpoint
            from .experiment import _merge_params

            variables, unmatched = convert_state_dict(
                load_torch_checkpoint(pre), model_name
            )
            params = _merge_params(params, variables)
        elif os.path.isdir(pre):
            # experiment directory: warm start from its best checkpoint
            # (reference configs point pretrain_path at a stage-1 ckpt,
            # experiments/localization/description.json:25)
            from .experiment import load_model_from_exp

            _, params = load_model_from_exp(pre, mode="best")
        else:
            params = ckpt.load_params(pre, params)
        print(f"Warm start from {pre}")

    lr = training_params["lr"]
    opt_state = optimizer.init(params)
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

    scheduler = ReduceLROnPlateau(
        lr_min=lr_sched_params["lr_min"], factor=lr_sched_params["factor"],
        patience=lr_sched_params["patience"],
        dont_halve_until_epoch=lr_sched_params["dont_halve_until_epoch"],
    )
    train_losses: list[float] = []
    val_losses: list[float] = []
    val_epochs: list[int] = []

    state_path = os.path.join(checkpoints_dir, "state.msgpack")
    if os.path.exists(state_path) and latest is not None:
        try:
            state = ckpt.load_state(state_path, opt_state)
            opt_state = state["opt_state"]
            scheduler.load_state_dict(state["scheduler"])
            train_losses = list(np.asarray(state["train_losses"]))
            val_losses = list(np.asarray(state["val_losses"]))
            lr = float(state["lr"])
        except Exception as e:
            # Corrupt/interrupted state: params resume from the epoch
            # checkpoint, optimizer restarts fresh (losses from the sidecar).
            print(f"[WARNING] could not load optimizer state ({e}); "
                  "resuming with a fresh optimizer")
            summary = ckpt.load_state_summary(state_path)
            if summary:
                train_losses = list(summary["train_losses"])
                val_losses = list(summary["val_losses"])
                lr = float(summary["lr"])
                scheduler.load_state_dict(summary["scheduler"])
        # Epoch numbers for the loaded history: the JSON sidecar is written
        # every epoch while the binary state's loss lists refresh only when
        # the optimizer state is saved (SWARM_OPT_STATE_EVERY) — so when the
        # sidecar's history is at least as long, it is the fresher record
        # and carries explicit epochs (checkpoints.summary_val_epochs).
        summary = ckpt.load_state_summary(state_path)
        if summary and len(summary["val_losses"]) >= len(val_losses):
            train_losses = list(summary["train_losses"])
            val_losses = list(summary["val_losses"])
            val_epochs = ckpt.summary_val_epochs(summary)
            # The sidecar is also the fresher record for lr and scheduler
            # state: after an unclean restart between SWARM_OPT_STATE_EVERY
            # binary saves, the binary carries up to N stale epochs of
            # ReduceLROnPlateau counters while the sidecar is per-epoch
            # (ADVICE r3).
            if "lr" in summary:
                lr = float(summary["lr"])
            if "scheduler" in summary:
                scheduler.load_state_dict(summary["scheduler"])
        else:
            val_epochs = list(range(start_epoch - len(val_losses),
                                    start_epoch))
        # Make the resumed lr effective for the FIRST epoch after resume
        # (the in-loop update only runs at end of epoch).
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

    # Fault tolerance = per-epoch checkpoints + auto-resume (above); an
    # interrupt mid-epoch loses at most that epoch (reference: train.py:233).
    for epoch in range(start_epoch, training_params["epochs"]):
        seed_all(seed + epoch)
        print(f"\n{'=' * 25} STARTING EPOCH {epoch} {'=' * 25}\n")
        t1 = time.time()
        epoch_loss, n_batches = 0.0, 0
        # Device loss scalars synced once per print_interval, not per step:
        # a per-step float(loss) blocks on the full relay round trip and
        # serializes dispatch; letting the host run K steps ahead overlaps
        # H2D, compute and RTT.  The periodic sync doubles as backpressure —
        # at most K batches (+ prefetch depth) are in flight on device.
        pending: list = []
        timing = os.environ.get("ACOUSTIC_TRAIN_TIMING", "0") != "0"
        t_fetch = t_step = t_sync = 0.0
        it = iter(_device_prefetch(train_loader))
        batch_idx = 0
        while True:
            t0 = time.time()
            batch = next(it, None)
            t_fetch += time.time() - t0
            if batch is None or (max_steps_per_epoch
                                 and batch_idx >= max_steps_per_epoch):
                break
            # Per-step perturb key: epoch/step-indexed so every step of
            # every epoch draws fresh noise, deterministically per seed.
            step = (np.uint32(epoch * 1_000_003 + batch_idx)
                    if perturb is not None else None)
            t0 = time.time()
            params, opt_state, loss = train_step(params, opt_state, batch,
                                                 step)
            t_step += time.time() - t0
            pending.append(loss)
            n_batches += 1
            if batch_idx % print_interval == 0:
                t0 = time.time()
                epoch_loss += float(jnp.stack(pending).sum())
                pending.clear()
                t_sync += time.time() - t0
                print(f"Train Epoch {epoch} [{batch_idx}] "
                      f"Loss: {float(loss):.6f}"
                      + (f"  (fetch {t_fetch:.1f}s step {t_step:.1f}s "
                         f"sync {t_sync:.1f}s)" if timing else ""))
                if timing:
                    t_fetch = t_step = t_sync = 0.0
            batch_idx += 1
        if pending:
            epoch_loss += float(jnp.stack(pending).sum())
            pending.clear()
        train_loss = epoch_loss / max(n_batches, 1)
        print(f"Train epoch time: {time.time() - t1:.02f}s  "
              f"loss {train_loss:.4f}  rss {_rss_gb():.1f}G")

        # Validation with fixed seed (reference train.py:193-195)
        seed_all(VAL_SEED)
        test_loss, n_test = 0.0, 0
        metrics = []
        if compute_val_metrics:
            # _sisdr_metrics needs the host batch — keep the simple loop.
            for batch_idx, batch in enumerate(test_loader):
                if max_steps_per_epoch and batch_idx >= max_steps_per_epoch:
                    break
                jb = tuple(jnp.asarray(b) for b in batch)
                test_loss += float(eval_step(params, jb))
                n_test += 1
                metrics.extend(_sisdr_metrics(model, model_name, params, batch))
        else:
            for batch_idx, batch in enumerate(_device_prefetch(test_loader)):
                if max_steps_per_epoch and batch_idx >= max_steps_per_epoch:
                    break
                pending.append(eval_step(params, batch))
                n_test += 1
                if len(pending) >= print_interval:
                    test_loss += float(jnp.stack(pending).sum())
                    pending.clear()
            if pending:
                test_loss += float(jnp.stack(pending).sum())
                pending.clear()
        test_loss /= max(n_test, 1)
        print(f"Test set: Average Loss: {test_loss:.4f}")
        if metrics:
            in_s = np.mean([m["input_si_sdr"] for m in metrics])
            out_s = np.mean([m["si_sdr"] for m in metrics])
            print(f"Average Input SI-SDR: {in_s:.03f}, Output: {out_s:.03f}, "
                  f"SI-SDRi: {out_s - in_s:.03f}")

        _, next_lr = scheduler(lr, epoch, test_loss)
        if next_lr != lr:
            print(f"NEXT learning rate: {next_lr:.08f}")
        lr = next_lr
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)

        train_losses.append(train_loss)
        val_losses.append(test_loss)
        val_epochs.append(epoch)
        ckpt.save_params(
            os.path.join(checkpoints_dir,
                         f"{experiment_name}_{epoch}.msgpack"), params)
        # The optimizer state is 2x the model size; on a slow-interconnect
        # runtime its per-epoch transfer dominates the epoch, so it is saved
        # periodically (resume tolerates a fresh optimizer).  Loss histories
        # and scheduler state stay per-epoch via the JSON sidecar.
        rss = _rss_gb()
        rss_exit = (_RSS_EXIT_GB > 0 and rss > _RSS_EXIT_GB
                    and epoch < training_params["epochs"] - 1)
        save_opt = (epoch % int(os.environ.get("SWARM_OPT_STATE_EVERY", "5"))
                    == 0) or epoch == training_params["epochs"] - 1 \
            or rss_exit
        ckpt.save_state(state_path,
                        opt_state if save_opt else None,
                        scheduler.state_dict(),
                        train_losses, val_losses, epoch, lr,
                        val_epochs=val_epochs)
        print(f"\n{'=' * 25} FINISHED EPOCH {epoch} {'=' * 25}\n")

        if rss_exit:
            print(f"RSS {rss:.1f}G > {_RSS_EXIT_GB:.0f}G (relay H2D leak); "
                  f"exiting {RSS_EXIT_CODE} for wrapper restart.")
            sys.stdout.flush()
            sys.exit(RSS_EXIT_CODE)

    return train_losses, val_losses


def _example_inputs_for(model_name: str, model_params: dict):
    n_mics = model_params.get("n_mics", 7)
    if model_name == "SpeakerLocalization":
        return (jnp.zeros((1, n_mics, 256)), jnp.ones((1, 2)))
    max_spk = model_params.get("max_speakers", 6)
    return (jnp.zeros((1, n_mics * max_spk, 256)), jnp.asarray([1]))


def _enable_compilation_cache():
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("experiment_dir", type=str)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--print_interval", type=int, default=20)
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the session pins "
                             "JAX_PLATFORMS=axon via sitecustomize)")
    parser.add_argument("--max_steps_per_epoch", type=int, default=None,
                        help="cap train/val batches per epoch; with the "
                             "shuffled BatchLoader each capped epoch is a "
                             "fresh random corpus subset — keeps epoch wall "
                             "time (and checkpoint cadence) bounded as the "
                             "corpus grows")
    args = parser.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    _enable_compilation_cache()
    train(args.experiment_dir, seed=args.seed,
          print_interval=args.print_interval,
          max_steps_per_epoch=args.max_steps_per_epoch)
