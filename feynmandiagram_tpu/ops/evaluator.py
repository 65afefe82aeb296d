"""Batched TPU evaluator for lowered graphs.

Evaluates a ``LoweredGraph`` over a batch of Monte-Carlo samples as a
sequence of level-synchronous vector ops under ``jax.jit``:

- weights buffer ``w``: [num_slots, batch] — slot-major so a gather reads
  whole rows (batch = lane dimension, pad to a multiple of 128 on TPU)
- Sum level: ``segment_sum(w[src] * f, seg)`` with sorted segments
- Prod level (per arity k): elementwise product of k gathered rows
- Power level (per exponent n): ``integer_pow`` (safe for negative bases)

The Python loop over levels unrolls at trace time: graph structure is
static, only leaf values are traced.  The reference's per-sample scalar
interpreter/compiler (eval.jl, backend/static.jl) is replaced wholesale by
this data-parallel design.
"""
from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .lowering import LoweredGraph, lower
from ..computational_graph.graph import Graph


def _compensated_reduce(block: jnp.ndarray) -> jnp.ndarray:
    """Kahan-compensated sum over axis 0 (SURVEY §7.3 item 4).

    XLA preserves floating-point evaluation order (no unsafe reassociation),
    so the running-compensation recurrence survives compilation.  Roughly
    4x the VPU work of a plain reduce, but the evaluator is gather/HBM
    bound, so the cost is small; accuracy approaches f64 for f32 storage.
    """
    s = block[0]
    c = jnp.zeros_like(s)
    for i in range(1, block.shape[0]):
        y = block[i] - c
        t = s + y
        c = (t - s) - y
        s = t
    return s


def _eval_levels(lowered: LoweredGraph, w: jnp.ndarray,
                 acc_dtype=None, compensated: bool = False) -> jnp.ndarray:
    """Run all levels, returning the filled weight buffer [num_slots, batch].

    ``acc_dtype`` (optional) widens arithmetic: gathered rows are upcast,
    the op computes in ``acc_dtype``, and the block is stored back at
    ``w.dtype``.  Used by the bf16-storage mode, where the HBM-resident
    buffer (the bandwidth bottleneck) is half-width but sums/products still
    accumulate in f32.

    ``compensated`` switches every bucket reduction to Kahan summation —
    the production path for f32 storage on graphs deep enough that plain
    f32 drifts (order >= 5).
    """
    a = acc_dtype or w.dtype
    reduce0 = _compensated_reduce if compensated else (
        lambda b: jnp.sum(b, axis=0))
    for level in lowered.levels:
        if level.sums is not None:
            s = level.sums
            contrib = w[s.edge_src].astype(a) * s.edge_factor[:, None].astype(a)
            block = jax.ops.segment_sum(contrib, s.edge_seg, num_segments=s.count,
                                        indices_are_sorted=True)
            w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), s.start, axis=0)
        for sb in level.sum_buckets:
            # dense gather + reduce over the padded fan-in axis (no scatter)
            block = reduce0(w[sb.idx].astype(a) * sb.fac[:, :, None].astype(a))
            w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), sb.start, axis=0)
        for fb in level.fused:
            # uniform sum-of-products: out[c] = sum_a fac[a,c] * prod_k w[idx[k,a,c]]
            block = w[fb.idx[0]].astype(a) * fb.fac[:, :, None].astype(a)
            for k in range(1, fb.n_op):
                block = block * w[fb.idx[k]].astype(a)
            block = reduce0(block)
            w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), fb.start, axis=0)
        for p in level.prods:
            block = w[p.idx[0]].astype(a)
            for k in range(1, p.arity):
                block = block * w[p.idx[k]].astype(a)
            block = block * p.factor[:, None].astype(a)
            w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), p.start, axis=0)
        for pw in level.pows:
            block = jax.lax.integer_pow(w[pw.src].astype(a), pw.n) * pw.factor[:, None].astype(a)
            w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), pw.start, axis=0)
    return w


def recommended_batch(lowered: LoweredGraph, *, dtype_bytes: int = 4,
                      vmem_budget: int = 64 << 20, lane: int = 128,
                      max_batch: int = 4096) -> int:
    """Starting-point MC batch size for one chip: the largest lane-multiple
    keeping the weight buffer ``num_slots * batch * dtype_bytes`` inside a
    conservative VMEM budget.

    Measured on v5e (PARITY.md batch scan): gathers against a VMEM-resident
    buffer run ~60x faster than HBM-resident (11.1 TB/s vs 181 GB/s), so
    throughput cliffs when the buffer outgrows VMEM (128 MB on v5e; the
    default budget leaves room for bucket index tables and leaf buffers).
    The optimum shifts with graph shape — sweep +-2x around this value on
    the target chip.
    """
    b = vmem_budget // (dtype_bytes * max(lowered.num_slots, 1))
    b = max(lane, int(b // lane) * lane)
    return min(b, max_batch)


def make_evaluator(lowered: LoweredGraph, *, dtype=None, jit: bool = True,
                   return_all: bool = False, acc_dtype=None,
                   compensated: bool = False):
    """Build ``f(leaf_values[num_leaves, batch]) -> roots[num_roots, batch]``.

    ``leaf_values`` covers the non-constant leaf slots (0..nl-1); constant
    slots are appended internally.  With ``return_all`` the full weight
    buffer is returned (used by lowering-equivalence tests).

    ``dtype=jnp.bfloat16, acc_dtype=jnp.float32`` selects the bf16-storage
    mode: the weight buffer (the HBM bandwidth bottleneck) is half-width,
    arithmetic accumulates in f32, outputs are returned in ``acc_dtype``.
    """
    if dtype is None:
        from .dtypes import default_device_dtype
        dtype = default_device_dtype()
    num_slots = lowered.num_slots
    nl_total = lowered.num_leaves
    n_const = len(lowered.const_slots)
    nl_input = nl_total - n_const
    const_values = jnp.asarray(lowered.const_values, dtype)
    root_slots = jnp.asarray(lowered.root_slots)

    def evaluate(leaf_values: jnp.ndarray) -> jnp.ndarray:
        leaf_values = jnp.asarray(leaf_values, dtype)
        if leaf_values.ndim == 1:
            leaf_values = leaf_values[:, None]
        batch = leaf_values.shape[1]
        w = jnp.zeros((num_slots, batch), dtype)
        w = jax.lax.dynamic_update_slice_in_dim(w, leaf_values, 0, axis=0)
        if n_const:
            cv = jnp.broadcast_to(const_values[:, None], (n_const, batch))
            w = jax.lax.dynamic_update_slice_in_dim(w, cv, nl_input, axis=0)
        w = _eval_levels(lowered, w, acc_dtype, compensated)
        if return_all:
            return w
        out = w[root_slots]
        return out.astype(acc_dtype) if acc_dtype is not None else out

    return jax.jit(evaluate) if jit else evaluate


def evaluate_graphs(roots: Sequence[Graph], leaf_values,
                    leafmap: Optional[Dict[int, int]] = None, *,
                    dtype=None):
    """One-shot convenience: lower + evaluate ``roots`` on ``leaf_values``.

    ``leaf_values``: [num_leaves] or [num_leaves, batch], indexed by
    ``leafmap`` (or by lowering's first-visit leaf order when absent — in
    that case pass values for leaves in ``lowered.leaf_uid_to_slot`` order).
    """
    lowered = lower(roots, leafmap)
    f = make_evaluator(lowered, dtype=dtype)
    return np.asarray(f(jnp.asarray(leaf_values)))
