"""Checkpoint save/load for params + training state.

Counterpart of the reference's torch.save flow
(/root/reference/sep/training/train.py:218-226): per-epoch param files
`<exp>_<epoch>.msgpack` plus a `state.msgpack` carrying the optimizer state,
scheduler state, and loss histories; resume picks the max epoch
(train.py:117-129).  Uses flax msgpack serialization (host-portable, no
pickling of live objects).
"""
from __future__ import annotations

import glob
import json
import os
import re

import numpy as np
from flax import serialization


def _to_host(tree):
    """Fetch a pytree to host with overlapped per-leaf transfers.

    flax serialization fetches leaves one by one; on a remote-dispatch TPU
    runtime each fetch pays ~0.5 s latency, turning a 47M-param checkpoint
    into minutes.  jax.device_get starts all copies asynchronously first."""
    import jax

    return jax.device_get(tree)


def _atomic_write(path: str, data: bytes) -> None:
    """Write-then-rename so interrupted saves never leave truncated files."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_params(path: str, params) -> None:
    _atomic_write(path, serialization.to_bytes(_to_host(params)))


def load_params(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_state(path: str, opt_state, scheduler_state: dict,
               train_losses: list, val_losses: list, epoch: int,
               lr: float) -> None:
    if opt_state is not None:
        state = {
            "opt_state": _to_host(opt_state),
            "scheduler": scheduler_state,
            "train_losses": np.asarray(train_losses, dtype=np.float64),
            "val_losses": np.asarray(val_losses, dtype=np.float64),
            "epoch": epoch,
            "lr": lr,
        }
        _atomic_write(path, serialization.to_bytes(state))
    # Sidecar JSON so readers (e.g. best-checkpoint selection) don't need an
    # optimizer-state template to deserialize the msgpack.
    with open(path + ".json", "w") as f:
        json.dump({"epoch": epoch, "lr": lr,
                   "train_losses": list(map(float, train_losses)),
                   "val_losses": list(map(float, val_losses)),
                   "scheduler": scheduler_state}, f)


def load_state_summary(path: str) -> dict | None:
    """Read the sidecar JSON written by save_state."""
    if not os.path.exists(path + ".json"):
        return None
    with open(path + ".json") as f:
        return json.load(f)


def load_state(path: str, opt_state_template):
    template = {
        "opt_state": opt_state_template,
        "scheduler": {"best_loss": 0.0, "bad_epochs": 0},
        "train_losses": np.zeros(0),
        "val_losses": np.zeros(0),
        "epoch": 0,
        "lr": 0.0,
    }
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def find_checkpoints(checkpoints_dir: str, experiment_name: str):
    """(epoch, path) pairs of saved param checkpoints, sorted by epoch."""
    pattern = os.path.join(checkpoints_dir, f"{experiment_name}_*.msgpack")
    out = []
    for p in glob.glob(pattern):
        m = re.search(rf"{re.escape(experiment_name)}_([0-9]+)\.msgpack$", p)
        if m:
            out.append((int(m.group(1)), p))
    return sorted(out)


def latest_checkpoint(checkpoints_dir: str, experiment_name: str):
    ckpts = find_checkpoints(checkpoints_dir, experiment_name)
    return ckpts[-1] if ckpts else None
