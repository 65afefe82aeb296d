"""Probe: which Mosaic/Pallas constructs compile on this stack (TPU v5e).

Round-1 blockers (PARITY.md): vectorized in-VMEM gather fails; (1, B)
single-row DMA slices rejected by the tiling checker.  This checks the
neighborhood of workarounds: unaligned multi-row DMA, aligned-group DMA
with dynamic group index, in-VMEM dynamic row reads, one-hot MXU selects.
"""
import functools
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, B = 4096, 512
w = jax.device_put(np.arange(S * B, dtype=np.float32).reshape(S, B) % 1000)
rows = jax.device_put(np.asarray([17, 256, 1031, 9], np.int32))


def try_case(name, fn):
    try:
        out = jax.block_until_ready(fn())
        print(f"OK    {name}: {np.asarray(out).ravel()[:2]}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"FAIL  {name}: {type(e).__name__}: {msg}")


# 1. unaligned dynamic-start size-8 DMA HBM->VMEM
def k_dma8(rows_ref, w_ref, out_ref, scratch, sem):
    r = rows_ref[0]
    pltpu.make_async_copy(w_ref.at[pl.ds(r, 8), :], scratch, sem).start()
    pltpu.make_async_copy(w_ref.at[pl.ds(r, 8), :], scratch, sem).wait()
    out_ref[:] = scratch[:]


def case_dma8():
    return pl.pallas_call(
        k_dma8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, B), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w)


# 2. aligned-group DMA: dynamic index into [S/8, 8, B]
def k_dmagrp(rows_ref, w3_ref, out_ref, scratch, sem):
    g = rows_ref[0] // 8
    pltpu.make_async_copy(w3_ref.at[g], scratch, sem).start()
    pltpu.make_async_copy(w3_ref.at[g], scratch, sem).wait()
    out_ref[:] = scratch[:]


def case_dmagrp():
    w3 = w.reshape(S // 8, 8, B)
    return pl.pallas_call(
        k_dmagrp,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, B), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w3)


# 3. in-VMEM dynamic single-row read (traced row index)
def k_vmemrow(rows_ref, w_ref, out_ref):
    r = rows_ref[0]
    out_ref[:] = w_ref[pl.ds(r, 1), :]


def case_vmemrow():
    return pl.pallas_call(
        k_vmemrow,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
    )(rows, w[:256])


# 4. in-VMEM dynamic 8-row read, unaligned start
def k_vmem8(rows_ref, w_ref, out_ref):
    r = rows_ref[0]
    out_ref[:] = w_ref[pl.ds(r, 8), :]


def case_vmem8():
    return pl.pallas_call(
        k_vmem8,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w[:256])


# 5. accumulate a dynamically-indexed VMEM row into a fixed accumulator row
def k_acc(rows_ref, w_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def body(i, _):
        r = rows_ref[i]
        out_ref[pl.ds(0, 1), :] += w_ref[pl.ds(r, 1), :]
        return 0
    jax.lax.fori_loop(0, 4, body, 0)


def case_acc():
    return pl.pallas_call(
        k_acc,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
    )(rows, w[:256])


# 6. one-hot MXU row-select inside kernel: onehot(1,K) @ w_vmem(K,B)
def k_onehot(rows_ref, w_ref, out_ref):
    r = rows_ref[0]
    K = w_ref.shape[0]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (8, K), 1) ==
           r + jax.lax.broadcasted_iota(jnp.int32, (8, K), 0)).astype(jnp.float32)
    out_ref[:] = jnp.dot(sel, w_ref[:], preferred_element_type=jnp.float32)


def case_onehot():
    return pl.pallas_call(
        k_onehot,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w[:256])


# 7. dynamic-position write (scatter-row) into VMEM out
def k_dynwrite(rows_ref, w_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    r = rows_ref[0] % 8
    out_ref[pl.ds(r, 1), :] = w_ref[pl.ds(0, 1), :]


def case_dynwrite():
    return pl.pallas_call(
        k_dynwrite,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w[:256])


# 8. DMA with dynamic destination offset in VMEM scratch
def k_dmadyn_dst(rows_ref, w_ref, out_ref, scratch, sem):
    r = rows_ref[0]
    j = rows_ref[1] % 4
    cp = pltpu.make_async_copy(w_ref.at[pl.ds(r * 8, 8), :],
                               scratch.at[pl.ds(j * 8, 8), :], sem)
    cp.start()
    cp.wait()
    out_ref[:] = scratch[pl.ds(0, 8), :]


def case_dmadyn_dst():
    return pl.pallas_call(
        k_dmadyn_dst,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((32, B), jnp.float32),
                            pltpu.SemaphoreType.DMA],
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w)


# 9. jnp.take over small VMEM array
def k_take(rows_ref, w_ref, out_ref):
    idx = jnp.array([3, 1, 4, 1, 5, 9, 2, 6], jnp.int32)
    out_ref[:] = jnp.take(w_ref[:], idx, axis=0)


def case_take():
    return pl.pallas_call(
        k_take,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((8, B), jnp.float32),
    )(rows, w[:256])


for name, fn in [
    ("unaligned dyn-start (r,8) DMA HBM->VMEM", case_dma8),
    ("aligned group DMA w3[g] (8,B)", case_dmagrp),
    ("in-VMEM dyn 1-row read", case_vmemrow),
    ("in-VMEM dyn 8-row read unaligned", case_vmem8),
    ("fori accumulate dyn rows into row 0", case_acc),
    ("in-kernel one-hot MXU select", case_onehot),
    ("dyn-position 1-row VMEM write", case_dynwrite),
    ("DMA dyn src + dyn dst offsets", case_dmadyn_dst),
    ("jnp.take static idx in VMEM", case_take),
]:
    try_case(name, fn)
