"""Experiment-directory handling: description.json + checkpoint resolution.

Counterpart of /root/reference/sep/helpers/utils.py:165-215
(`load_model_from_exp` with 'best' / 'last' / 'new' modes) keeping the
reference's experiment-directory layout: `<exp>/description.json` plus
`<exp>/checkpoints/` holding per-epoch weights and a state file.  Both our
msgpack checkpoints and reference torch `.pt` checkpoints are accepted — the
latter are converted on load (models/convert.py).
"""
from __future__ import annotations

import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.factory import create_model
from .checkpoints import (find_checkpoints, load_params, load_state_summary,
                          summary_val_epochs)


def best_checkpoint_path(summary: dict | None,
                         our_ckpts: list[tuple[int, str]]) -> str:
    """Pick the lowest-val-loss checkpoint from (epoch, path) pairs.

    Maps the argmin over the sidecar's val-loss history to a TRUE epoch
    number via summary_val_epochs — loss histories can start later than
    epoch 0 after a corrupt-state recovery (see that docstring)."""
    if summary is not None and summary["val_losses"]:
        idx = int(np.argmin(summary["val_losses"]))
        best_epoch = summary_val_epochs(summary)[idx]
        by_epoch = dict(our_ckpts)
        return by_epoch.get(best_epoch, our_ckpts[-1][1])
    return our_ckpts[-1][1]


def read_description(exp_dir: str) -> dict:
    with open(os.path.join(exp_dir, "description.json"), "rb") as f:
        return json.load(f)


def _example_inputs(model_name: str, model_params: dict):
    n_mics = model_params.get("n_mics", 7)
    if model_name == "SpeakerLocalization":
        return (jnp.zeros((1, n_mics, 256)), jnp.ones((1, 2)))
    max_spk = model_params.get("max_speakers", 6)
    return (jnp.zeros((1, n_mics * max_spk, 256)), jnp.asarray([1]))


def build_from_description(exp_dir: str):
    desc = read_description(exp_dir)
    model = create_model(desc["model_name"], desc["model_params"])
    return model, desc


def init_params_for(model, model_name: str, model_params: dict, seed: int = 0):
    from ..models.factory import init_model

    return init_model(model, jax.random.PRNGKey(seed),
                      _example_inputs(model_name, model_params))


def load_model_from_exp(exp_dir: str, mode: str = "best",
                        strict_convert: bool = True):
    """Returns (model, params).

    Checkpoints always live in `<exp_dir>/checkpoints/` — the same place
    train() writes them — regardless of any `experiment_name` key in the
    description (that key only prefixes reference-style torch filenames,
    /root/reference/sep/helpers/utils.py:171-178).
    """
    desc = read_description(exp_dir)
    model_name = desc["model_name"]
    # train() always names files after the directory basename; descriptions
    # may additionally carry an `experiment_name` used by reference-style
    # torch checkpoints — accept either prefix.
    names = [os.path.basename(exp_dir.rstrip("/"))]
    if desc.get("experiment_name") and desc["experiment_name"] not in names:
        names.append(desc["experiment_name"])
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    model = create_model(model_name, desc["model_params"])
    template = init_params_for(model, model_name, desc["model_params"])

    # Reference torch checkpoints present? Convert directly.
    torch_ckpts = sorted(
        p for n in names
        for p in glob.glob(os.path.join(ckpt_dir, f"{n}_*.pt"))
    )
    our_ckpts = next(
        (c for n in names if (c := find_checkpoints(ckpt_dir, n))), []
    )

    if mode == "new" or (not torch_ckpts and not our_ckpts):
        release = os.path.join(exp_dir, "release", "params_f16.msgpack")
        if mode != "new" and os.path.exists(release):
            # git-tracked float16 release weights (exported by
            # scripts/export_release.py) — survive checkpoint-dir cleanup
            print(f"[experiment] loading release weights {release}")
            f16_template = jax.tree_util.tree_map(
                lambda x: np.zeros(x.shape, np.float16), template)
            loaded = load_params(release, f16_template)
            return model, jax.tree_util.tree_map(
                lambda t, v: jnp.asarray(v, dtype=t.dtype), template, loaded)
        if mode != "new":
            print("[WARNING] no checkpoint found, using fresh parameters")
        return model, template

    if our_ckpts:
        state_path = os.path.join(ckpt_dir, "state.msgpack")
        summary = load_state_summary(state_path) if mode == "best" else None
        path = best_checkpoint_path(summary, our_ckpts)
        return model, load_params(path, template)

    # torch fallback: pick the highest epoch
    from ..models.convert import convert_state_dict, load_torch_checkpoint

    path = max(torch_ckpts,
               key=lambda p: int(p.rsplit("_", 1)[1].split(".")[0]))
    sd = load_torch_checkpoint(path)
    variables, unmatched = convert_state_dict(sd, model_name)
    if unmatched:
        msg = (f"{len(unmatched)} unmatched torch keys converting {path}, "
               f"e.g. {unmatched[:5]} — the converted model would silently "
               f"keep random values for those parameters")
        if strict_convert:
            raise ValueError(msg + " (pass strict_convert=False to override)")
        print(f"[WARNING] {msg}")
    merged = _merge_params(template, variables)
    return model, merged


def _merge_params(template, converted):
    """Overlay converted params on the template (fills any gaps, validates
    shapes)."""
    def merge(t, c, path=""):
        if isinstance(t, dict):
            out = {}
            for k in t:
                if isinstance(c, dict) and k in c:
                    out[k] = merge(t[k], c[k], f"{path}/{k}")
                else:
                    out[k] = t[k]
            return out
        arr = np.asarray(c)
        assert arr.shape == t.shape, f"shape mismatch at {path}: " \
                                     f"{arr.shape} vs {t.shape}"
        return jnp.asarray(arr, dtype=t.dtype)

    return merge(template, converted)
