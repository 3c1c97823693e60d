"""Device-mesh parallelism for the swarm pipeline.

The workload's scaling axes (SURVEY.md §2.3):
- `data`    — independent mixtures/rooms (data parallel; DCN-friendly)
- `cand`    — spotforming candidates / SRP grid clusters (the workload's
              real scaling axis; ICI all-gather at the end of a sweep)

The models themselves are tens of millions of parameters, so they stay
replicated (the reference's DataParallel did the same within one host,
/root/reference/sep/training/train.py:143); tensor sharding is applied where
the big tensors actually live: the (G, K*P) SRP steering table and the
candidate batch of the spotforming sweep.  Training shards the batch over
`data`, letting XLA insert the psum for gradient reduction.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int = 1, n_cand: int | None = None,
              devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_cand is None:
        n_cand = len(devices) // n_data
    return Mesh(devices.reshape(n_data, n_cand), ("data", "cand"))


def shard_spotform_sweep(mesh: Mesh, run_fn):
    """Wrap a spotform batch fn (params, mix, shifts, onehot) -> (B, T) so
    the candidate batch axis is sharded over the `cand` mesh axis (mix and
    params replicated).  XLA all-gathers the outputs."""
    in_shardings = (
        NamedSharding(mesh, P()),            # params (replicated; tree ok)
        NamedSharding(mesh, P()),            # mix
        NamedSharding(mesh, P("cand", None)),  # shifts (B, M)
        NamedSharding(mesh, P()),            # window onehot
    )
    out_shardings = NamedSharding(mesh, P("cand", None))
    return jax.jit(run_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def shard_srp_map(mesh: Mesh, srp_fn):
    """Shard the SRP steering contraction over the grid-cluster axis G —
    tensor parallelism over the pipeline's largest tensor.  Each device
    computes its slice of the (G,) map; outputs concatenate over `cand`."""
    in_shardings = (
        NamedSharding(mesh, P()),              # signal (M, T)
        NamedSharding(mesh, P("cand", None)),  # steer_re (G, K*P)
        NamedSharding(mesh, P("cand", None)),  # steer_im
        NamedSharding(mesh, P()),              # cos basis
        NamedSharding(mesh, P()),              # sin basis
    )
    out_shardings = NamedSharding(mesh, P("cand"))
    return jax.jit(srp_fn, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def srp_time_sharded(mesh: Mesh, axis: str = "cand"):
    """Sequence-parallel SRP: each device computes the steered-response map
    of its own analysis-window range and the per-grid running max merges
    with an ICI `pmax` — the collective mirror of the reference's
    `torch.maximum` window merge (SRP_Prunning.py:430); see SURVEY.md §2.3.

    Returns a function (per_device_signal, steer_re, steer_im, cos_b, sin_b,
    window, nfft, hop) -> (G,) map, where `per_device_signal` is (D, M, Tw)
    with one window-range slab per device along the leading axis.
    """
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    from ..ops.srp import srp_phat_map

    def build(window: int, nfft: int, hop: int):
        def local(slab, sre, sim, cb, sb):
            m = srp_phat_map(slab[0], sre, sim, cb, sb, window, nfft, hop)
            return jax.lax.pmax(m, axis)

        return jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(axis, None, None), P(), P(), P(), P()),
            out_specs=P(),
        ))

    return build


def shard_train_step(mesh: Mesh, train_step):
    """Data-parallel training step: batch axis over `data` x `cand`
    (flattened — every device takes a batch shard), params/opt replicated.
    XLA inserts the gradient psum."""
    batch_sharding = NamedSharding(mesh, P(("data", "cand")))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        train_step,
        in_shardings=(repl, repl, batch_sharding),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
