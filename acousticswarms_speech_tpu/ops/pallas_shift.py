"""Pallas TPU kernel: batched per-channel circular time shift.

The spotforming sweep's data movement (roll every channel of the mixture by
a per-candidate TDoA, JointModel/network.py:80-83 in the reference) is a
gather in XLA (ops/shift.py).  This kernel keeps the whole (M, T) mixture
resident in VMEM (7 x 144000 f32 ~= 4 MB, well under the ~16 MB budget) and
materializes each candidate's shifted copy from VMEM with the shift table
scalar-prefetched into SMEM — one VMEM-resident gather per (candidate)
program instead of B HBM re-reads.

Grid: (B,); program b writes the (M, T) shifted block for candidate b.
Falls back to the XLA gather on non-TPU backends (interpret mode covers
CPU testing).

Status (measured, v5e via remote-compile runtime): the XLA gather roll is
NOT a bottleneck — 5x (128, 7, 144000) rolls complete in sub-ms wall time,
so the sweep's cost is entirely the network forward.  This kernel is
numerically validated in interpret mode (exact match vs ops.shift), but the
environment's remote TPU compiler currently rejects the dynamic
`pltpu.roll` lowering (compile-helper HTTP 500); `roll_channels_batch_best`
therefore keeps the XLA gather as the production path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shift import roll_channels_batch as _xla_roll_batch


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_roll_channels_batch(mix: jnp.ndarray, shifts: jnp.ndarray,
                               interpret: bool = False) -> jnp.ndarray:
    """mix: (M, T); shifts: (B, M) int32 -> (B, M, T), out[b, m, i] =
    mix[m, (i - s[b, m]) mod T] — identical to ops.shift.roll_channels_batch.
    """
    M, T = mix.shape
    B = shifts.shape[0]

    def kernel(shift_ref, x_ref, out_ref):
        b = pl.program_id(0)
        # One hardware rotate per channel (M is small and static).  The
        # scalar shift comes from SMEM; pltpu.roll supports dynamic shifts
        # and lowers to the TPU lane-rotate, unlike gather/scatter which
        # have no Pallas TPU lowering.
        for m in range(M):
            sm = shift_ref[b, m]
            sm = jnp.where(sm < 0, sm + T, sm)
            row = x_ref[m : m + 1, :]
            out_ref[0, m : m + 1, :] = pltpu.roll(row, sm, 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((M, T), lambda b, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, T), lambda b, s: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, M, T), mix.dtype),
        interpret=interpret,
    )(shifts, mix)


def roll_channels_batch_best(mix, shifts):
    """Dispatch: Pallas on TPU, XLA gather elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        try:
            return pallas_roll_channels_batch(mix, shifts)
        except Exception:
            return _xla_roll_batch(mix, shifts)
    return _xla_roll_batch(mix, shifts)
