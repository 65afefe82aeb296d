"""Pallas TPU kernels for the graph evaluator's hot op.

``bucket_gather_reduce`` implements the padded sum-bucket primitive

    out[c, :] = sum_a fac[a, c] * w[idx[a, c], :]

as a hand-written kernel: row indices arrive via scalar prefetch
(PrefetchScalarGridSpec), each output tile issues its gather as a burst of
overlapped async DMAs from the weight buffer (one semaphore per in-flight
row copy), then reduces on the VPU.

Status (TPU v5e, jax 0.9 / Mosaic on this stack; see PARITY.md):
- vectorized in-VMEM gathers (jnp.take / take_along_axis) fail to lower,
  so a whole-graph VMEM-resident evaluator is not expressible;
- single-row DMA slices (shape (1, batch)) are rejected by the Mosaic
  tiling checker ("slice shape along dimension 0 must be aligned to 8"),
  blocking the row-DMA gather formulation in compiled mode.

The kernel is therefore validated in interpreter mode and kept as the
scaffold for future Mosaic gather support; the production evaluator uses
XLA's native gather lowering (ops.evaluator), which measured faster than
any Pallas formulation available under these constraints.

Round-3 addendum: the VMEM-residency measurements (PARITY.md) close the
question of whether a hand kernel could beat XLA here.  When the weight
buffer fits in VMEM (the batch-sizing rule of ``recommended_batch``),
XLA's gather already runs at ~11 TB/s — VMEM speed, nothing left to win;
when it does not, throughput is capped by the DMA/HBM gather ceiling
(~181 GB/s measured), which a Pallas kernel is equally subject to.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows of the output computed per grid step
TILE_C = 8


def _bucket_kernel(idx_ref, fac_ref, w_ref, out_ref, scratch, sems, *, arity,
                   tile_c, batch):
    """One grid step: gather arity*tile_c rows of w via overlapped DMAs,
    multiply by factors, reduce over the arity axis.

    idx and fac both arrive via scalar prefetch (SMEM), so row addresses and
    per-node factors are available before the body runs.
    """
    t = pl.program_id(0)
    base = t * tile_c

    # launch all row copies for this tile (they overlap in the DMA engines)
    for a in range(arity):
        for j in range(tile_c):
            row = idx_ref[a, base + j]
            pltpu.make_async_copy(
                w_ref.at[pl.ds(row, 1), :],
                scratch.at[a, pl.ds(j, 1), :],
                sems.at[a, j],
            ).start()
    for a in range(arity):
        for j in range(tile_c):
            row = idx_ref[a, base + j]
            pltpu.make_async_copy(
                w_ref.at[pl.ds(row, 1), :],
                scratch.at[a, pl.ds(j, 1), :],
                sems.at[a, j],
            ).wait()

    acc = jnp.zeros((tile_c, batch), jnp.float32)
    for a in range(arity):
        fvec = jnp.stack([fac_ref[a, base + j] for j in range(tile_c)])
        acc = acc + scratch[a] * fvec[:, None]
    out_ref[:] = acc


def bucket_gather_reduce(w: jnp.ndarray, idx: np.ndarray, fac: np.ndarray, *,
                         interpret: bool = False) -> jnp.ndarray:
    """out[c, :] = sum_a fac[a, c] * w[idx[a, c], :] via the Pallas kernel.

    ``idx``/``fac`` are static [arity, count] tables; count is padded up to
    TILE_C internally (padding rows gather row 0 with factor 0).
    """
    arity, count = idx.shape
    batch = w.shape[1]
    count_p = ((count + TILE_C - 1) // TILE_C) * TILE_C
    idx_p = np.zeros((arity, count_p), np.int32)
    fac_p = np.zeros((arity, count_p), np.float32)
    idx_p[:, :count] = idx
    fac_p[:, :count] = fac

    grid = (count_p // TILE_C,)
    kernel = functools.partial(_bucket_kernel, arity=arity, tile_c=TILE_C,
                               batch=batch)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # idx + fac tables in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),          # w stays off-chip
            ],
            out_specs=pl.BlockSpec((TILE_C, batch),
                                   lambda t, idx_ref, fac_ref: (t, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((arity, TILE_C, batch), jnp.float32),
                pltpu.SemaphoreType.DMA((arity, TILE_C)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((count_p, batch), jnp.float32),
        interpret=interpret,
    )(idx_p, fac_p, w.astype(jnp.float32))
    return out[:count]
