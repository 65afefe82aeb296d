"""Same-shape bucket stacking under lax.scan (VERDICT r4 #3 / round-5 #3).

Hypothesis under test: the residual ~197 us/pass gap between the device-op
sum (~493 us) and wall (~690 us) on the order-4 production pass is inter-op
sequencing overhead on ~1,000 ops; stacking same-shape bucket CHUNKS into
one `lax.scan` body per (level, arity, n_op, rows) group replaces N
device-op groups with one scanned op at ZERO padding (unlike every measured
padded-merge negative, PARITY.md coalescing scan).

Correctness: chunks within one level have no intra-level dependencies, so
any per-level execution order (including a scan) is valid; the scan
iterates in lowering order.

Measurement protocol identical to bench.py (on-device MC fori_loop,
median of 3 reps).  Usage:

    python benchmarks/scan_stack.py [order] [batch] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_scan_evaluator(lowered, *, dtype, chunk_rows=512, min_group=2):
    """Tile-layout evaluator where, per level, fused-bucket chunks of equal
    (n_op, arity, rows) shape run under ONE lax.scan; singleton shapes fall
    back to the unrolled path (ops/evaluator.py::_eval_levels_tile)."""
    import jax
    import jax.numpy as jnp
    from feynmandiagram_tpu.ops.evaluator import _take

    num_slots = lowered.num_slots
    nl_total = lowered.num_leaves
    n_const = len(lowered.const_slots)
    nl_input = nl_total - n_const
    const_values = jnp.asarray(lowered.const_values, dtype)
    root_slots = jnp.asarray(lowered.root_slots)

    # per level: group (bucket, chunk) pieces by shape
    level_plans = []
    for level in lowered.levels:
        assert level.sums is None and not level.sum_buckets and not level.prods
        groups = {}          # (n_op, arity, rows) -> [(idx, fac, start)]
        for fb in level.fused:
            for c0 in range(0, fb.count, chunk_rows):
                rows = min(chunk_rows, fb.count - c0)
                idx = fb.idx[..., c0:c0 + rows]
                fac = fb.fac[..., c0:c0 + rows]
                groups.setdefault((fb.n_op, fb.arity, rows), []).append(
                    (idx, fac, fb.start + c0))
        scans, single = [], []
        for (n_op, arity, rows), pieces in groups.items():
            if len(pieces) >= min_group:
                idx = np.stack([p[0] for p in pieces])   # [N, n_op, arity, rows]
                fac = np.stack([p[1] for p in pieces])   # [N, arity, rows]
                starts = np.asarray([p[2] for p in pieces], np.int32)
                scans.append((jnp.asarray(idx), jnp.asarray(fac, dtype),
                              jnp.asarray(starts), n_op, arity))
            else:
                single.extend(pieces)
        level_plans.append((scans, single, level.pows))

    def evaluate(leaf_values):
        leaf_values = jnp.asarray(leaf_values, dtype)
        if leaf_values.ndim == 3:            # pre-tiled [nl, nsub, 128]
            nsub = leaf_values.shape[1]
            batch = nsub * 128
        else:
            batch = leaf_values.shape[1]
            nsub = batch // 128
            leaf_values = leaf_values.reshape(nl_input, nsub, 128)
        w = jnp.zeros((num_slots, nsub, 128), dtype)
        w = jax.lax.dynamic_update_slice_in_dim(w, leaf_values, 0, axis=0)
        if n_const:
            cv = jnp.broadcast_to(const_values[:, None, None],
                                  (n_const, nsub, 128))
            w = jax.lax.dynamic_update_slice_in_dim(w, cv, nl_input, axis=0)
        for li, (scans, single, pows) in enumerate(level_plans):
          with jax.named_scope(f"gL{li:02d}"):
            for idx, fac, starts, n_op, arity in scans:
                with jax.named_scope(f"scan{arity}x{n_op}x{idx.shape[0]}"):
                    def body(w, op):
                        i, f, s = op
                        blk = _take(w, i[0, 0]) * f[0][:, None, None]
                        for k in range(1, n_op):
                            blk = blk * _take(w, i[k, 0])
                        for t in range(1, arity):
                            part = _take(w, i[0, t]) * f[t][:, None, None]
                            for k in range(1, n_op):
                                part = part * _take(w, i[k, t])
                            blk = blk + part
                        w = jax.lax.dynamic_update_slice_in_dim(
                            w, blk, s, axis=0)
                        return w, None

                    w, _ = jax.lax.scan(body, w, (idx, fac, starts))
            for idx_np, fac_np, start in single:
                n_op, arity, rows = idx_np.shape
                with jax.named_scope(f"fb{arity}x{n_op}"):
                    idx = jnp.asarray(idx_np)
                    fac = jnp.asarray(fac_np, dtype)
                    blk = _take(w, idx[0, 0]) * fac[0][:, None, None]
                    for k in range(1, n_op):
                        blk = blk * _take(w, idx[k, 0])
                    for t in range(1, arity):
                        part = _take(w, idx[0, t]) * fac[t][:, None, None]
                        for k in range(1, n_op):
                            part = part * _take(w, idx[k, t])
                        blk = blk + part
                    w = jax.lax.dynamic_update_slice_in_dim(w, blk, start,
                                                            axis=0)
            for pw in pows:
                with jax.named_scope(f"pow{pw.n}"):
                    blk = jax.lax.integer_pow(_take(w, jnp.asarray(pw.src)),
                                              pw.n) \
                        * jnp.asarray(pw.factor, dtype)[:, None, None]
                    w = jax.lax.dynamic_update_slice_in_dim(
                        w, blk, pw.start, axis=0)
        return w[root_slots].reshape(len(lowered.root_slots), batch)

    return evaluate


def main():
    import jax
    import jax.numpy as jnp

    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace
    from feynmandiagram_tpu.backends.compile import (compile_evaluator,
                                                     leafmap_of,
                                                     leaf_graphs_of)
    from feynmandiagram_tpu.ops.leaf_eval import (leaf_tables_from_lowered,
                                                  make_leaf_evaluator)

    order = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 200
    dtype = jnp.float32

    para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    roots = [row["diagram"] for row in vertex4(para)]
    optimize_inplace(roots, level=1)
    compiled = compile_evaluator(roots, max_loop_num=para.totalLoopNum,
                                 beta=0.5, kF=1.919, lam=1.0, dtype=dtype)
    low = compiled.lowered

    # how much stacking is available?
    n_chunks = n_scanned = n_scan_ops = 0
    for level in low.levels:
        shapes = {}
        for fb in level.fused:
            for c0 in range(0, fb.count, 512):
                rows = min(512, fb.count - c0)
                shapes.setdefault((fb.n_op, fb.arity, rows), 0)
                shapes[(fb.n_op, fb.arity, rows)] += 1
                n_chunks += 1
        for v in shapes.values():
            if v >= 2:
                n_scanned += v
                n_scan_ops += 1
    print(f"# order {order}: {n_chunks} chunks, {n_scanned} stackable into "
          f"{n_scan_ops} scans", file=sys.stderr)

    tables = leaf_tables_from_lowered(low, leaf_graphs_of(roots),
                                      para.totalLoopNum)
    leaf_fn = make_leaf_evaluator(tables, beta=0.5, kF=1.919, lam=1.0,
                                  dtype=dtype, layout="tile")
    num_tau = para.totalTauNum

    def bench(graph_fn, label):
        from _mc_bench import mc_samples_per_s

        sps = mc_samples_per_s(lambda vk, vt: graph_fn(leaf_fn(vk, vt)),
                               n_loop=para.totalLoopNum, num_tau=num_tau,
                               batch=batch, n_roots=len(low.root_slots),
                               dtype=dtype, iters=iters, beta=0.5)
        print(f"{label}: {sps / 1e3:.1f}k samples/s")
        return sps

    from feynmandiagram_tpu.ops.evaluator import make_evaluator
    base_fn = make_evaluator(low, dtype=dtype, jit=False, layout="tile")
    scan_fn = make_scan_evaluator(low, dtype=dtype)

    # equality check first
    rng = np.random.default_rng(0)
    nl = low.num_leaves - len(low.const_slots)
    vals = rng.uniform(0.5, 1.5, (nl, batch)).astype(np.float32)
    a = np.asarray(jax.jit(base_fn)(vals))
    b = np.asarray(jax.jit(scan_fn)(vals))
    np.testing.assert_allclose(b, a, rtol=2e-4, atol=1e-6)
    print("# equality ok", file=sys.stderr)

    bench(base_fn, f"baseline tile b={batch}")
    bench(scan_fn, f"scan-stacked b={batch}")


if __name__ == "__main__":
    main()
