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

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .lowering import LoweredGraph, lower
from ..computational_graph.graph import Graph


def _take(w, idx):
    """Row gather without the bounds-clamp op: all index tables are built
    host-side from slot assignments and are in bounds by construction.
    Measured on v5e: the clamp fusions cost ~8% of the graph phase."""
    return w.at[idx].get(mode="promise_in_bounds")


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
                 acc_dtype=None, compensated: bool = False,
                 chunk_rows: int = 512) -> jnp.ndarray:
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
    for li, level in enumerate(lowered.levels):
      # named scopes attach tf_op metadata so jax.profiler traces attribute
      # device time to (level, bucket shape) — see benchmarks/profile_pass.py
      with jax.named_scope(f"gL{li:02d}"):
        if level.sums is not None:
            s = level.sums
            with jax.named_scope("csr"):
                contrib = _take(w, s.edge_src).astype(a) * s.edge_factor[:, None].astype(a)
                block = jax.ops.segment_sum(contrib, s.edge_seg, num_segments=s.count,
                                            indices_are_sorted=True)
                w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), s.start, axis=0)
        for sb in level.sum_buckets:
            # dense gather + reduce over the padded fan-in axis (no scatter)
            with jax.named_scope(f"sb{sb.arity}"):
                block = reduce0(_take(w, sb.idx).astype(a) * sb.fac[:, :, None].astype(a))
                w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), sb.start, axis=0)
        for fb in level.fused:
            # uniform sum-of-products: out[c] = sum_a fac[a,c] * prod_k w[idx[k,a,c]]
            # per-operand row gathers, tile-aligned blocks.  Two measured
            # dead ends on v5e (PARITY.md profile table): a combined
            # [n_op*arity*count]-row gather per level amortizes gather
            # startup but its ~30 MB result spills to HBM (0.60x), and a
            # single [n_op, arity, count]-index gather per bucket adds
            # layout-fix copies (0.79x).  Very large buckets split into
            # column chunks so gather results stay VMEM-resident.
            with jax.named_scope(f"fb{fb.arity}x{fb.n_op}"):
                for c0 in range(0, fb.count, chunk_rows):
                    idx = fb.idx[..., c0:c0 + chunk_rows]
                    fac = fb.fac[..., c0:c0 + chunk_rows]
                    block = _take(w, idx[0]).astype(a) * fac[:, :, None].astype(a)
                    for k in range(1, fb.n_op):
                        block = block * _take(w, idx[k]).astype(a)
                    block = reduce0(block)
                    w = jax.lax.dynamic_update_slice_in_dim(
                        w, block.astype(w.dtype), fb.start + c0, axis=0)
        for p in level.prods:
            with jax.named_scope(f"prod{p.arity}"):
                block = _take(w, p.idx[0]).astype(a)
                for k in range(1, p.arity):
                    block = block * _take(w, p.idx[k]).astype(a)
                block = block * p.factor[:, None].astype(a)
                w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), p.start, axis=0)
        for pw in level.pows:
            with jax.named_scope(f"pow{pw.n}"):
                block = jax.lax.integer_pow(_take(w, pw.src).astype(a), pw.n) * pw.factor[:, None].astype(a)
                w = jax.lax.dynamic_update_slice_in_dim(w, block.astype(w.dtype), pw.start, axis=0)
    return w


def _eval_levels_tile(lowered: LoweredGraph, w: jnp.ndarray,
                      acc_dtype=None, compensated: bool = False,
                      unroll_max: int = 8, split_count: int = 64,
                      chunk_rows: int = 256) -> jnp.ndarray:
    """Tile-row variant of ``_eval_levels``: ``w`` is [num_slots, nsub, 128].

    Each graph row is a whole number of (8, 128) tiles, so a row gather
    moves full tiles instead of single sublanes — measured 2-4x the
    row-gather throughput of the flat [num_slots, batch] layout on v5e,
    where the gather engine reads the full 8-row sublane tile per gathered
    row (PARITY.md profile table).  Buckets with arity <= ``unroll_max``
    additionally unroll the term sum into per-term row gathers whose
    multiply-adds fuse into the slot update (measured: the 4-D
    multiply_reduce fusion is ~4x slower than the same flops as unrolled
    fused adds).  Requires sum_mode='fused' lowering.
    """
    a = acc_dtype or w.dtype
    for li, level in enumerate(lowered.levels):
      if level.sums is not None or level.sum_buckets or level.prods:
          raise ValueError("tile layout requires sum_mode='fused' lowering")
      with jax.named_scope(f"gL{li:02d}"):
        for fb in level.fused:
            with jax.named_scope(f"fb{fb.arity}x{fb.n_op}"):
                # Gather strategy (measured on v5e, PARITY.md profile
                # table): per-(operand, term) gathers amortize best for
                # LARGE buckets (count >= split_count); for small buckets
                # the ~0.3 us per-gather startup dominates, so gather once
                # per operand position ([arity, count] indices) and unroll
                # the term sum as slice-adds (the fused 4-D multiply_reduce
                # is ~4x slower than the same flops as unrolled adds).
                # Very large buckets additionally split into <=chunk_rows
                # column chunks so per-chunk gather results stay
                # VMEM-resident (one order-4 G*W product bucket has 5,368
                # rows — unchunked, its two 44 MB gather results at batch
                # 2048 spill to HBM).
                for c0 in range(0, fb.count, chunk_rows):
                    idx = fb.idx[..., c0:c0 + chunk_rows]
                    fac = fb.fac[..., c0:c0 + chunk_rows]
                    if fb.count >= split_count and fb.arity <= unroll_max:
                        def term(t):
                            part = _take(w, idx[0, t]).astype(a) \
                                * fac[t][:, None, None].astype(a)
                            for k in range(1, fb.n_op):
                                part = part * _take(w, idx[k, t]).astype(a)
                            return part
                    else:
                        gs = [_take(w, idx[k]).astype(a)
                              for k in range(fb.n_op)]

                        def term(t):
                            part = gs[0][t] * fac[t][:, None, None].astype(a)
                            for k in range(1, fb.n_op):
                                part = part * gs[k][t]
                            return part
                    blk = term(0)
                    comp = jnp.zeros_like(blk) if compensated else None
                    for t in range(1, fb.arity):
                        part = term(t)
                        if compensated:
                            y = part - comp
                            tsum = blk + y
                            comp = (tsum - blk) - y
                            blk = tsum
                        else:
                            blk = blk + part
                    w = jax.lax.dynamic_update_slice_in_dim(
                        w, blk.astype(w.dtype), fb.start + c0, axis=0)
        for pw in level.pows:
            with jax.named_scope(f"pow{pw.n}"):
                blk = jax.lax.integer_pow(_take(w, pw.src).astype(a), pw.n) \
                    * pw.factor[:, None, None].astype(a)
                w = jax.lax.dynamic_update_slice_in_dim(
                    w, blk.astype(w.dtype), pw.start, axis=0)
    return w


def recommended_batch(lowered: LoweredGraph, *, dtype_bytes: int = 4,
                      vmem_budget: int = 88 << 20, lane: int = 128,
                      max_batch: int = 4096) -> int:
    """Starting-point MC batch size for one chip: the largest batch keeping
    the weight buffer ``num_slots * batch * dtype_bytes`` inside a
    conservative VMEM budget, preferring tile-layout batches (multiples of
    1024, so the [num_slots, batch//128, 128] tile-row buffer applies —
    2-3x faster row gathers, see ``_eval_levels_tile``), falling back to a
    lane multiple when VMEM only admits a sub-1024 batch.

    Measured on v5e (PARITY.md batch scan): throughput cliffs when the
    buffer outgrows VMEM (128 MB on v5e; the budget leaves room for bucket
    tables and leaf buffers).  The measured feasibility boundary sits
    between 92.3 MB (config-4 series at batch 3072: fast) and 94.3 MB
    (order-4 vertex4 at batch 3072: cliff), so the 88 MiB default
    reproduces every measured optimum: order-4 vertex4 (7,672 slots) ->
    2048, order-5 (44,144 slots) -> 512, config-4 series (~7,0xx slots)
    -> 3072.  The optimum shifts with graph shape — sweep +-2x around
    this value on the target chip.
    """
    b = vmem_budget // (dtype_bytes * max(lowered.num_slots, 1))
    if b >= 1024:
        return min(int(b // 1024) * 1024, max_batch)
    b = max(lane, int(b // lane) * lane)
    return min(b, max_batch)


def make_evaluator(lowered: LoweredGraph, *, dtype=None, jit: bool = True,
                   return_all: bool = False, acc_dtype=None,
                   compensated: bool = False, layout: str = "auto",
                   chunk_rows: Optional[int] = None):
    """Build ``f(leaf_values[num_leaves, batch]) -> roots[num_roots, batch]``.

    ``leaf_values`` covers the non-constant leaf slots (0..nl-1); constant
    slots are appended internally.  With ``return_all`` the full weight
    buffer is returned (used by lowering-equivalence tests).

    ``dtype``/``acc_dtype`` are generic: e.g. ``dtype=jnp.bfloat16,
    acc_dtype=jnp.float32`` gives a half-width weight buffer with f32
    accumulation.  This is a low-level capability only (~1% storage error,
    flat layout): the round-3 bf16 production knob was removed in round 4 —
    it never beat the best f32 configuration at any measured production
    shape (PARITY.md).

    ``layout``: 'flat' keeps the weight buffer [num_slots, batch];
    'tile' reshapes it to [num_slots, batch//128, 128] so every graph row
    is a whole number of (8, 128) TPU tiles — 2-4x faster row gathers (see
    ``_eval_levels_tile``).  'auto' (default) picks 'tile' on TPU for
    fused-mode f32 lowerings when the batch is a multiple of 1024,
    else 'flat'.  Results are identical up to summation order.
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
    fused_only = all(lvl.sums is None and not lvl.sum_buckets and not lvl.prods
                     for lvl in lowered.levels)
    if layout not in ("auto", "flat", "tile"):
        raise ValueError(f"unknown layout {layout!r}")
    if layout == "tile" and not fused_only:
        raise ValueError("layout='tile' requires sum_mode='fused' lowering")

    def _tile_ok(batch: int) -> bool:
        if layout == "flat":
            return False
        if layout == "tile":
            # explicit request: reject unsupported configs loudly instead of
            # silently falling back (ADVICE r4 #1)
            if jnp.dtype(dtype).itemsize != 4:
                raise ValueError(
                    "layout='tile' supports 4-byte dtypes only (the tile-row "
                    f"buffer assumes the f32 (8, 128) tile); got {dtype}")
            if batch % 256 != 0:
                raise ValueError("layout='tile' needs batch % 256 == 0")
            return True
        # auto
        if not fused_only or jnp.dtype(dtype).itemsize != 4:
            return False
        if jax.devices()[0].platform == "cpu":
            return False
        return batch % 1024 == 0

    def evaluate(leaf_values: jnp.ndarray) -> jnp.ndarray:
        leaf_values = jnp.asarray(leaf_values, dtype)
        if leaf_values.ndim == 1:
            leaf_values = leaf_values[:, None]
        if leaf_values.ndim == 3:
            # pre-tiled [nl, nsub, 128] input (a tile-layout leaf evaluator)
            if leaf_values.shape[2] != 128 or not fused_only:
                raise ValueError("3-D leaf input must be [nl, nsub, 128] "
                                 "for a fused-mode lowering")
            batch = leaf_values.shape[1] * 128
            tile = True
        else:
            batch = leaf_values.shape[1]
            tile = _tile_ok(batch)
        if tile:
            nsub = batch // 128
            leaf_values = leaf_values.reshape(nl_input, nsub, 128)
            w = jnp.zeros((num_slots, nsub, 128), dtype)
        else:
            w = jnp.zeros((num_slots, batch), dtype)
        w = jax.lax.dynamic_update_slice_in_dim(w, leaf_values, 0, axis=0)
        if n_const:
            cv = jnp.broadcast_to(
                const_values.reshape((n_const,) + (1,) * (w.ndim - 1)),
                (n_const,) + w.shape[1:])
            w = jax.lax.dynamic_update_slice_in_dim(w, cv, nl_input, axis=0)
        # bucket-chunk size: keeps per-chunk gather results VMEM-resident.
        # Measured optima on v5e (round 5, interleaved 5-rep medians):
        # 256 rows for the tile layout (3,438k vs 3,229k at 512 on the
        # order-4 default), 512 for flat.
        if tile:
            w = _eval_levels_tile(lowered, w, acc_dtype, compensated,
                                  chunk_rows=chunk_rows or 256)
        else:
            w = _eval_levels(lowered, w, acc_dtype, compensated,
                             chunk_rows=chunk_rows or 512)
        if return_all:
            return w.reshape(num_slots, batch) if tile else w
        out = w[root_slots]
        if tile:
            out = out.reshape(len(lowered.root_slots), batch)
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
