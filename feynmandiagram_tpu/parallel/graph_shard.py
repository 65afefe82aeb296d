"""Level-partitioned (graph-sharded) evaluation across a device mesh.

For DAGs too large to evaluate per chip at full batch, each topological
level's nodes are partitioned across the ``graph`` mesh axis: every device
computes an equal shard of every bucket (buckets pre-padded to a multiple of
the axis size), and the level's output block is exchanged with one
``all_gather`` over ICI before the next level reads it.  Communication per
level is exactly the level's activations — the design of BASELINE config 5
(boundary activations exchanged per level).  Composes with batch-axis data
parallelism on a 2-D mesh.
"""
from __future__ import annotations

from dataclasses import replace
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.lowering import LevelPlan, LoweredGraph, PowerPlan, ProdPlan, SumBucket

GRAPH_AXIS = "graph"


def _pad_to(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _pad_bucket(b: SumBucket, n_dev: int) -> SumBucket:
    count_p = _pad_to(b.count, n_dev)
    if count_p == b.count:
        return b
    idx = np.zeros((b.idx.shape[0], count_p), b.idx.dtype)
    fac = np.zeros((b.fac.shape[0], count_p), b.fac.dtype)
    idx[:, :b.count] = b.idx
    fac[:, :b.count] = b.fac
    return SumBucket(b.arity, b.start, b.count, idx, fac)


def _pad_prod(p: ProdPlan, n_dev: int) -> ProdPlan:
    count_p = _pad_to(p.count, n_dev)
    if count_p == p.count:
        return p
    idx = np.zeros((p.arity, count_p), p.idx.dtype)
    fac = np.zeros(count_p, p.factor.dtype)
    idx[:, :p.count] = p.idx
    fac[:p.count] = p.factor
    return ProdPlan(p.arity, p.start, p.count, idx, fac)


def _pad_pow(p: PowerPlan, n_dev: int) -> PowerPlan:
    count_p = _pad_to(p.count, n_dev)
    if count_p == p.count:
        return p
    src = np.zeros(count_p, p.src.dtype)
    fac = np.zeros(count_p, p.factor.dtype)
    src[:p.count] = p.src
    fac[:p.count] = p.factor
    return PowerPlan(p.n, p.start, p.count, src, fac)


def make_graph_sharded_evaluator(lowered: LoweredGraph, mesh: Mesh, *,
                                 graph_axis: str = GRAPH_AXIS,
                                 batch_axis: Optional[str] = None,
                                 dtype=jnp.float64):
    """Build ``f(leaf_values[num_leaves, batch]) -> roots[R, batch]`` with
    level-sharded compute over ``graph_axis`` (and optional batch sharding
    over ``batch_axis``)."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    n_dev = mesh.shape[graph_axis]
    levels = [LevelPlan(None, [ _pad_prod(p, n_dev) for p in lvl.prods],
                        [_pad_pow(pw, n_dev) for pw in lvl.pows],
                        [_pad_bucket(sb, n_dev) for sb in lvl.sum_buckets])
              for lvl in lowered.levels]
    if any(lvl.sums is not None for lvl in lowered.levels):
        raise ValueError("graph-sharded evaluation requires sum_mode='bucketed'")

    num_slots = lowered.num_slots
    nl_total = lowered.num_leaves
    n_const = len(lowered.const_slots)
    nl_input = nl_total - n_const
    const_values = jnp.asarray(lowered.const_values, dtype)
    root_slots = jnp.asarray(lowered.root_slots)

    def device_fn(leaf_values):
        d = jax.lax.axis_index(graph_axis)
        batch = leaf_values.shape[1]
        w = jnp.zeros((num_slots, batch), dtype)
        w = jax.lax.dynamic_update_slice_in_dim(w, leaf_values.astype(dtype), 0, axis=0)
        if n_const:
            cv = jnp.broadcast_to(const_values[:, None], (n_const, batch))
            w = jax.lax.dynamic_update_slice_in_dim(w, cv, nl_input, axis=0)

        for level in levels:
            for sb in level.sum_buckets:
                shard = sb.idx.shape[1] // n_dev
                idx = jax.lax.dynamic_slice_in_dim(jnp.asarray(sb.idx), d * shard,
                                                   shard, axis=1)
                fac = jax.lax.dynamic_slice_in_dim(
                    jnp.asarray(sb.fac, dtype), d * shard, shard, axis=1)
                blk = jnp.sum(w[idx] * fac[:, :, None], axis=0)
                full = jax.lax.all_gather(blk, graph_axis, axis=0, tiled=True)
                w = jax.lax.dynamic_update_slice_in_dim(w, full[:sb.count],
                                                        sb.start, axis=0)
            for p in level.prods:
                shard = p.idx.shape[1] // n_dev
                idx = jax.lax.dynamic_slice_in_dim(jnp.asarray(p.idx), d * shard,
                                                   shard, axis=1)
                fac = jax.lax.dynamic_slice_in_dim(
                    jnp.asarray(p.factor, dtype), d * shard, shard, axis=0)
                blk = w[idx[0]]
                for a in range(1, p.arity):
                    blk = blk * w[idx[a]]
                blk = blk * fac[:, None]
                full = jax.lax.all_gather(blk, graph_axis, axis=0, tiled=True)
                w = jax.lax.dynamic_update_slice_in_dim(w, full[:p.count],
                                                        p.start, axis=0)
            for pw in level.pows:
                shard = pw.src.shape[0] // n_dev
                src = jax.lax.dynamic_slice_in_dim(jnp.asarray(pw.src), d * shard,
                                                   shard, axis=0)
                fac = jax.lax.dynamic_slice_in_dim(
                    jnp.asarray(pw.factor, dtype), d * shard, shard, axis=0)
                blk = jax.lax.integer_pow(w[src], pw.n) * fac[:, None]
                full = jax.lax.all_gather(blk, graph_axis, axis=0, tiled=True)
                w = jax.lax.dynamic_update_slice_in_dim(w, full[:pw.count],
                                                        pw.start, axis=0)
        return w[root_slots]

    in_spec = P(None, batch_axis) if batch_axis else P(None, None)
    out_spec = P(None, batch_axis) if batch_axis else P(None, None)

    sharded = None
    for kwargs in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            sharded = shard_map(device_fn, mesh=mesh, in_specs=(in_spec,),
                                out_specs=out_spec, **kwargs)
            break
        except TypeError:
            continue

    def evaluate(leaf_values):
        leaf_values = jnp.asarray(leaf_values, dtype)
        if leaf_values.ndim == 1:
            leaf_values = leaf_values[:, None]
        return sharded(leaf_values)

    return jax.jit(evaluate)
