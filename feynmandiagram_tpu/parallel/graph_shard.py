"""Memory-partitioned (graph-sharded) evaluation across a device mesh.

For DAGs too large to evaluate per chip at full batch (BASELINE config 5),
the slot space itself is partitioned: device d owns the leaf-block shard
plus an equal contiguous chunk of every bucket's output slots, so the
per-device weight buffer is ~``num_slots / n`` rows — NOT a replica of the
full buffer.  Per topological level:

1. every device gathers, from its *local* buffer, the rows it owns among
   the union of slots read at this level (its send block, padded to the
   per-level maximum H_l);
2. one ``all_gather`` over the ``graph`` ICI axis assembles the level's
   halo buffer ``[n*H_l, batch]`` — exactly the level's boundary
   activations, nothing else;
3. each device computes its chunk of every bucket reading only from the
   halo (operand indices are remapped host-side to halo positions) and
   writes the chunk at a static offset of its local buffer.

Root rows are assembled with one final exchange.  Composes with batch-axis
data parallelism on a 2-D (graph x batch) mesh.  Works for
``sum_mode='fused'`` (the production mode) and ``'bucketed'``; requires
``reuse_slots=False`` so slot ownership is single-assignment.

No reference counterpart (the reference is single-process,
/root/reference/src/computational_graph/eval.jl); this is the TPU-native
scale-out the brief adds (SURVEY §5.8b, §7.3-7).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.lowering import (FusedBucket, LoweredGraph, PowerPlan, ProdPlan,
                            SumBucket)

GRAPH_AXIS = "graph"


def _pad_to(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


@dataclass
class _ShardedGroup:
    """One bucket of one level, chunked across devices.

    Index arrays are already remapped to halo positions and reshaped so
    axis -2 is the device axis (each device dynamic-indexes its chunk).
    """
    kind: str                 # 'sum' | 'fused' | 'prod' | 'pow'
    local_off: int            # output offset in every device's local buffer
    chunk: int                # output rows per device
    idx: np.ndarray           # sum: [A, n, chunk]; fused: [K, A, n, chunk];
                              # prod: [A, n, chunk]; pow: [n, chunk]
    fac: np.ndarray           # sum/fused: [A, n, chunk]; prod/pow: [n, chunk]
    pow_n: int = 0


@dataclass
class _LevelSched:
    send_idx: np.ndarray      # [n, H] local row indices each device sends
    groups: List[_ShardedGroup]
    halo_rows: int            # n * H (rows received per device)
    read_rows: int            # true union size (pre-padding)


@dataclass
class ShardStats:
    """Memory/communication footprint of a graph-sharded plan."""
    n_dev: int
    full_slots: int           # slots of the unsharded buffer
    local_slots: int          # per-device buffer rows (must be < full_slots)
    halo_rows_per_level: List[int]
    read_rows_per_level: List[int]

    def halo_bytes_per_sample(self, itemsize: int = 4) -> int:
        """Bytes received per device per batch element over a full pass."""
        return sum(self.halo_rows_per_level) * itemsize


def _plan(lowered: LoweredGraph, n_dev: int) -> Tuple[List[_LevelSched], ShardStats,
                                                      np.ndarray, np.ndarray, int]:
    """Host-side planner: ownership map, per-level halo schedules, root plan.

    Returns (levels, stats, root_send_idx[n, Hr], root_pos[R], leaf_chunk).
    """
    if any(lvl.sums is not None for lvl in lowered.levels):
        raise ValueError(
            "graph-sharded evaluation requires sum_mode='bucketed' or 'fused' "
            "(csr segment-sums scatter across the slot partition)")

    num_slots = lowered.num_slots
    nl = lowered.num_leaves
    leaf_chunk = _pad_to(nl, n_dev) // n_dev

    owner = np.full(num_slots, -1, np.int32)
    local = np.full(num_slots, -1, np.int32)
    s = np.arange(nl)
    owner[s] = s // leaf_chunk
    local[s] = s % leaf_chunk
    local_top = leaf_chunk

    # ownership + local layout for every bucket chunk (identical on all devices)
    raw_levels: List[List[Tuple[str, object, int, int]]] = []
    for lvl in lowered.levels:
        groups = []
        plans = ([("sum", sb) for sb in lvl.sum_buckets]
                 + [("fused", fb) for fb in lvl.fused]
                 + [("prod", p) for p in lvl.prods]
                 + [("pow", pw) for pw in lvl.pows])
        for kind, plan in plans:
            count, start = plan.count, plan.start
            chunk = _pad_to(count, n_dev) // n_dev
            ks = np.arange(count)
            if (owner[start + ks] != -1).any():
                raise ValueError(
                    "slot ownership conflict: lower with reuse_slots=False "
                    "for graph-sharded evaluation")
            owner[start + ks] = ks // chunk
            local[start + ks] = local_top + ks % chunk
            groups.append((kind, plan, chunk, local_top))
            local_top += chunk
        raw_levels.append(groups)

    def halo_schedule(read_slots: np.ndarray) -> Tuple[np.ndarray, np.ndarray, int]:
        """Build (send_idx[n, H], pos[num_slots], n*H) for a set of read
        global slots: pos[s] = position of row s in the gathered halo."""
        read_slots = np.unique(read_slots)
        own = owner[read_slots]
        counts = np.bincount(own, minlength=n_dev)
        H = max(int(counts.max()), 1)
        send_idx = np.zeros((n_dev, H), np.int32)
        pos = np.full(num_slots, 0, np.int32)
        for d in range(n_dev):
            mine = read_slots[own == d]
            send_idx[d, :len(mine)] = local[mine]
            pos[mine] = d * H + np.arange(len(mine))
        return send_idx, pos, n_dev * H

    levels: List[_LevelSched] = []
    halo_rows_per_level: List[int] = []
    read_rows_per_level: List[int] = []
    for groups in raw_levels:
        reads = []
        for kind, plan, _, _ in groups:
            if kind in ("sum", "fused", "prod"):
                reads.append(np.asarray(plan.idx).ravel())
            else:
                reads.append(np.asarray(plan.src).ravel())
        read_slots = (np.unique(np.concatenate(reads)) if reads
                      else np.zeros(0, np.int64))
        send_idx, pos, halo_rows = halo_schedule(read_slots)
        sched_groups: List[_ShardedGroup] = []
        for kind, plan, chunk, local_off in groups:
            count_p = chunk * n_dev

            def pad_cols(a: np.ndarray, fill=0) -> np.ndarray:
                """Pad the trailing (node) axis to count_p, then split it
                into [n_dev, chunk]."""
                out = np.full(a.shape[:-1] + (count_p,), fill, a.dtype)
                out[..., :a.shape[-1]] = a
                return out.reshape(a.shape[:-1] + (n_dev, chunk))

            if kind == "sum":
                idx = pad_cols(pos[plan.idx])          # [A, n, chunk]
                fac = pad_cols(plan.fac, 0)            # [A, n, chunk]
                sched_groups.append(_ShardedGroup("sum", local_off, chunk, idx, fac))
            elif kind == "fused":
                idx = pad_cols(pos[plan.idx])          # [K, A, n, chunk]
                fac = pad_cols(plan.fac, 0)            # [A, n, chunk]
                sched_groups.append(_ShardedGroup("fused", local_off, chunk, idx, fac))
            elif kind == "prod":
                idx = pad_cols(pos[plan.idx])          # [A, n, chunk]
                fac = pad_cols(plan.factor, 0)         # [n, chunk]
                sched_groups.append(_ShardedGroup("prod", local_off, chunk, idx, fac))
            else:
                idx = pad_cols(pos[plan.src])          # [n, chunk]
                fac = pad_cols(plan.factor, 0)         # [n, chunk]
                sched_groups.append(_ShardedGroup("pow", local_off, chunk, idx, fac,
                                                  pow_n=plan.n))
        levels.append(_LevelSched(send_idx, sched_groups, halo_rows,
                                  len(read_slots)))
        halo_rows_per_level.append(halo_rows)
        read_rows_per_level.append(len(read_slots))

    root_send_idx, root_pos_map, root_halo = halo_schedule(
        np.asarray(lowered.root_slots))
    root_pos = root_pos_map[np.asarray(lowered.root_slots)]
    halo_rows_per_level.append(root_halo)
    read_rows_per_level.append(len(np.unique(lowered.root_slots)))

    stats = ShardStats(n_dev, num_slots, local_top, halo_rows_per_level,
                       read_rows_per_level)
    return levels, stats, root_send_idx, root_pos, leaf_chunk


def make_graph_sharded_evaluator(lowered: LoweredGraph, mesh: Mesh, *,
                                 graph_axis: str = GRAPH_AXIS,
                                 batch_axis: Optional[str] = None,
                                 dtype=None):
    """Build ``f(leaf_values[num_leaves, batch]) -> roots[R, batch]`` with a
    slot-partitioned weight buffer: per-device memory is
    ``stats.local_slots`` rows (~``num_slots / n``) plus one transient
    per-level halo buffer.  The returned function carries the planner's
    footprint as ``.stats`` (per-level halo rows = the exchanged boundary
    activations).
    """
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    if dtype is None:
        from ..ops.dtypes import default_device_dtype
        dtype = default_device_dtype()

    n_dev = mesh.shape[graph_axis]
    levels, stats, root_send_idx, root_pos, leaf_chunk = _plan(lowered, n_dev)

    nl_total = lowered.num_leaves
    n_const = len(lowered.const_slots)
    nl_input = nl_total - n_const
    const_values = np.asarray(lowered.const_values)
    root_pos_j = jnp.asarray(root_pos)

    # device-constant tables (stacked over the device axis; each device
    # dynamic-indexes its own slice under shard_map)
    send_tabs = [jnp.asarray(lv.send_idx) for lv in levels]
    root_send_tab = jnp.asarray(root_send_idx)

    def device_fn(leaf_block):
        """leaf_block: [leaf_chunk, batch] — this device's leaf rows."""
        d = jax.lax.axis_index(graph_axis)
        batch = leaf_block.shape[1]
        w = jnp.zeros((stats.local_slots, batch), dtype)
        w = jax.lax.dynamic_update_slice_in_dim(
            w, leaf_block.astype(dtype), 0, axis=0)

        for lev_i, lv in enumerate(levels):
            send_idx = jax.lax.dynamic_index_in_dim(
                send_tabs[lev_i], d, axis=0, keepdims=False)      # [H]
            halo = jax.lax.all_gather(w[send_idx], graph_axis,
                                      axis=0, tiled=True)         # [n*H, batch]
            for g in lv.groups:
                idx = jax.lax.dynamic_index_in_dim(
                    jnp.asarray(g.idx), d, axis=-2, keepdims=False)
                fac = jax.lax.dynamic_index_in_dim(
                    jnp.asarray(g.fac, dtype), d, axis=-2, keepdims=False)
                if g.kind == "sum":
                    blk = jnp.sum(halo[idx] * fac[:, :, None], axis=0)
                elif g.kind == "fused":
                    blk = halo[idx[0]] * fac[:, :, None]
                    for k in range(1, idx.shape[0]):
                        blk = blk * halo[idx[k]]
                    blk = jnp.sum(blk, axis=0)
                elif g.kind == "prod":
                    blk = halo[idx[0]]
                    for a in range(1, idx.shape[0]):
                        blk = blk * halo[idx[a]]
                    blk = blk * fac[:, None]
                else:
                    blk = jax.lax.integer_pow(halo[idx], g.pow_n) * fac[:, None]
                w = jax.lax.dynamic_update_slice_in_dim(
                    w, blk.astype(dtype), g.local_off, axis=0)

        root_send = jax.lax.dynamic_index_in_dim(
            root_send_tab, d, axis=0, keepdims=False)
        root_halo = jax.lax.all_gather(w[root_send], graph_axis,
                                       axis=0, tiled=True)
        return root_halo[root_pos_j]                              # [R, batch]

    in_spec = P(graph_axis, batch_axis)
    out_spec = P(None, batch_axis)

    sharded = None
    for kwargs in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            sharded = shard_map(device_fn, mesh=mesh, in_specs=(in_spec,),
                                out_specs=out_spec, **kwargs)
            break
        except TypeError:
            continue

    leaf_rows_padded = leaf_chunk * n_dev

    def evaluate(leaf_values):
        leaf_values = jnp.asarray(leaf_values, dtype)
        if leaf_values.ndim == 1:
            leaf_values = leaf_values[:, None]
        batch = leaf_values.shape[1]
        blocks = [leaf_values]
        if n_const:
            blocks.append(jnp.broadcast_to(
                jnp.asarray(const_values, dtype)[:, None], (n_const, batch)))
        pad = leaf_rows_padded - nl_total
        if pad:
            blocks.append(jnp.zeros((pad, batch), dtype))
        full = jnp.concatenate(blocks, axis=0) if len(blocks) > 1 else blocks[0]
        return sharded(full)

    class _Sharded:
        """Callable wrapper carrying the planner footprint as ``.stats``."""

        def __init__(self, fn, stats):
            self._fn = fn
            self.stats = stats

        def __call__(self, leaf_values):
            return self._fn(leaf_values)

    return _Sharded(jax.jit(evaluate), stats)
