"""Probe: structure + phase-time breakdown of the order-4 Gamma4 evaluation.

Reports what the kernel redesign must know: per-phase timing (leaf physics
vs graph phase), per-level op/node/edge counts, fan-out histogram,
fusable fan-out-1 Prod->Sum pairs, source-level locality, live working set.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace
    from feynmandiagram_tpu.backends.compile import compile_evaluator

    t0 = time.time()
    para = DiagPara(type=Ver4Diag, innerLoopNum=4, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    df = vertex4(para)
    roots = [row["diagram"] for row in df]
    optimize_inplace(roots, level=1)
    print(f"generate+optimize: {time.time()-t0:.1f}s")

    t0 = time.time()
    compiled = compile_evaluator(roots, max_loop_num=para.totalLoopNum,
                                 beta=0.5, kF=1.919, lam=1.0,
                                 dtype=jnp.float32, sum_mode="bucketed")
    print(f"lower+compile: {time.time()-t0:.1f}s")
    low = compiled.lowered

    # ---- level structure
    print(f"\nslots={low.num_slots} leaves={low.num_leaves} "
          f"levels={len(low.levels)} edges={low.num_edges} "
          f"roots={len(low.root_slots)}")
    n_ops = 0
    print(f"{'lev':>3} {'sumbk':>6} {'sumnodes':>8} {'sumedges':>8} "
          f"{'prods':>6} {'prodnodes':>9} {'pows':>5} {'pownodes':>8}")
    for i, lvl in enumerate(low.levels):
        sb_n = sum(b.count for b in lvl.sum_buckets)
        sb_e = sum(int((b.fac != 0).sum()) for b in lvl.sum_buckets)
        pr_n = sum(p.count for p in lvl.prods)
        pw_n = sum(p.count for p in lvl.pows)
        n_ops += len(lvl.sum_buckets) + len(lvl.prods) + len(lvl.pows)
        print(f"{i:3d} {len(lvl.sum_buckets):6d} {sb_n:8d} {sb_e:8d} "
              f"{len(lvl.prods):6d} {pr_n:9d} {len(lvl.pows):5d} {pw_n:8d}")
    print(f"total device ops (buckets+prods+pows): {n_ops}")

    # ---- fan-out: how many consumers each slot has
    consumers = np.zeros(low.num_slots, np.int64)
    slot_level = np.zeros(low.num_slots, np.int32)  # 0 = leaves
    for i, lvl in enumerate(low.levels, start=1):
        for b in lvl.sum_buckets:
            live = b.fac != 0
            np.add.at(consumers, b.idx[live], 1)
            slot_level[b.start:b.start + b.count] = i
        for p in lvl.prods:
            np.add.at(consumers, p.idx.ravel(), 1)
            slot_level[p.start:p.start + p.count] = i
        for pw in lvl.pows:
            np.add.at(consumers, pw.src, 1)
            slot_level[pw.start:pw.start + pw.count] = i
    hist = np.bincount(np.minimum(consumers[:low.num_slots], 10))
    print(f"fan-out histogram (capped at 10): {hist.tolist()}")

    # ---- source-level locality: for each edge, dest_level - src_level
    deltas = []
    for i, lvl in enumerate(low.levels, start=1):
        for b in lvl.sum_buckets:
            live = b.fac != 0
            deltas.append(i - slot_level[b.idx[live]])
        for p in lvl.prods:
            deltas.append(i - slot_level[p.idx.ravel()])
        for pw in lvl.pows:
            deltas.append(i - slot_level[pw.src])
    deltas = np.concatenate(deltas)
    dh = np.bincount(np.minimum(deltas, 8))
    print(f"edge src-level distance histogram (1=prev level, capped 8): {dh.tolist()}")
    leaf_edges = int((deltas >= np.asarray([slot_level.max()])).sum())

    # ---- live working set per level (liveness: slot dead after last consumer level)
    last_use = np.zeros(low.num_slots, np.int32)
    def touch(idx, lev):
        np.maximum.at(last_use, idx.ravel(), lev)
    for i, lvl in enumerate(low.levels, start=1):
        for b in lvl.sum_buckets:
            touch(b.idx[b.fac != 0], i)
        for p in lvl.prods:
            touch(p.idx, i)
        for pw in lvl.pows:
            touch(pw.src, i)
    born = slot_level
    max_live = 0
    for i in range(1, len(low.levels) + 1):
        live = int(((born <= i) & (last_use >= i)).sum())
        max_live = max(max_live, live)
    print(f"max live slots across levels: {max_live} (of {low.num_slots})")

    # ---- fusable fan-out-1 Prod -> Sum pairs (graph-level op fusion potential)
    prod_slots = set()
    for lvl in low.levels:
        for p in lvl.prods:
            for k in range(p.count):
                prod_slots.add(p.start + k)
    fusable = sum(1 for s in prod_slots if consumers[s] == 1)
    print(f"prod nodes: {len(prod_slots)}, fan-out-1 prods: {fusable}")

    # ---- phase timing breakdown on device
    batch = 4096
    rng = np.random.default_rng(0)
    varK = jax.device_put(rng.standard_normal((3, para.totalLoopNum, batch)).astype(np.float32))
    varT = jax.device_put((rng.random((para.totalLoopNum, batch)) * 0.5).astype(np.float32))

    leaf_j = jax.jit(compiled.leaf_fn)
    graph_j = jax.jit(compiled.graph_fn)
    lv = jax.block_until_ready(leaf_j(varK, varT))
    out = jax.block_until_ready(graph_j(lv))
    full = jax.block_until_ready(compiled.fn(varK, varT))

    def t(f, *a, iters=20):
        jax.block_until_ready(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters

    t_leaf = t(leaf_j, varK, varT)
    t_graph = t(graph_j, lv)
    t_full = t(compiled.fn, varK, varT)
    print(f"\nbatch={batch}: leaf={t_leaf*1e3:.2f}ms graph={t_graph*1e3:.2f}ms "
          f"full={t_full*1e3:.2f}ms -> {batch/t_full:.0f} samples/s")
    print(f"graph-phase edges/s: {low.num_edges * batch / t_graph / 1e9:.1f} G")


if __name__ == "__main__":
    main()
