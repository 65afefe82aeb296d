"""On-chip scan of fused-bucket coalescing (merge_threshold) x batch size.

Generates/optimizes the order-N vertex4 graph ONCE, then compiles and times
the fused evaluator per configuration.  Prints one JSON line per config:
threshold, batch, bucket count, padded gather elements, samples/s.

FDTPU_SCAN_FUSED=1 (default) times the production on-device MC loop
(sampling + leaf + graph under one jit fori_loop — the steady, bench-default
mode); 0 times host-driven dispatch per pass (the round-3 scan mode, ~20%
run-to-run swing, kept for comparison).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def padded_elements(lowered) -> int:
    """Total gathered operand elements per sample (incl. padding reads)."""
    tot = 0
    for lv in lowered.levels:
        for fb in lv.fused:
            tot += fb.n_op * fb.arity * fb.count
        for sb in lv.sum_buckets:
            tot += sb.arity * sb.count
        for p in lv.prods:
            tot += p.arity * p.count
        for pw in lv.pows:
            tot += pw.count
    return tot


def main():
    import jax
    import jax.numpy as jnp

    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace
    from feynmandiagram_tpu.backends.compile import compile_evaluator

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    order = int(os.environ.get("FDTPU_BENCH_ORDER", 4))
    para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    df = vertex4(para)
    roots = [row["diagram"] for row in df]
    optimize_inplace(roots, level=1)

    thresholds = [int(x) for x in os.environ.get(
        "FDTPU_SCAN_THRESHOLDS",
        "0,2000,10000,50000,200000,1000000000").split(",")]
    batches = [int(x) for x in os.environ.get(
        "FDTPU_SCAN_BATCHES", "1536").split(",")]
    fused_loop = os.environ.get("FDTPU_SCAN_FUSED", "1") == "1"
    iters = int(os.environ.get("FDTPU_BENCH_ITERS", 100 if fused_loop else 20))
    rng = np.random.default_rng(0)
    samples = {}
    for batch in batches:
        samples[batch] = (
            jax.device_put(rng.standard_normal(
                (3, para.totalLoopNum, batch)).astype(np.float32)),
            jax.device_put((rng.random(
                (para.totalTauNum, batch)) * 0.5).astype(np.float32)))

    ref_out = {}
    for thr in thresholds:
        compiled = compile_evaluator(
            roots, max_loop_num=para.totalLoopNum, beta=0.5, kF=1.919,
            lam=1.0, dtype=dtype, sum_mode="fused", merge_threshold=thr)
        n_buckets = sum(len(lv.fused) + len(lv.pows)
                        for lv in compiled.lowered.levels)
        for batch in batches:
            varK, varT = samples[batch]
            if fused_loop:
                num_tau = para.totalTauNum

                @jax.jit
                def mc_chunk(key):
                    def body(i, acc):
                        k1, k2 = jax.random.split(jax.random.fold_in(key, i))
                        vk = jax.random.normal(
                            k1, (3, para.totalLoopNum, batch), dtype)
                        vt = jax.random.uniform(
                            k2, (num_tau, batch), dtype) * 0.5
                        r = compiled.fn(vk, vt)
                        return acc + jnp.sum(r, axis=1)

                    return jax.lax.fori_loop(0, iters, body, jnp.zeros(
                        (len(compiled.lowered.root_slots),), dtype))

                jax.block_until_ready(mc_chunk(jax.random.PRNGKey(0)))
                times = []
                for r in range(1, 4):
                    t0 = time.perf_counter()
                    jax.block_until_ready(mc_chunk(jax.random.PRNGKey(r)))
                    times.append(time.perf_counter() - t0)
                dt = sorted(times)[len(times) // 2]
                anchor = 0.0
            else:
                out = compiled(varK, varT)
                jax.block_until_ready(out)  # compile + warmup
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = compiled(varK, varT)
                jax.block_until_ready(out)
                dt = time.perf_counter() - t0
                anchor = float(np.asarray(out)[0].mean())
            sps = batch * iters / dt
            ref = ref_out.setdefault(batch, anchor)
            print(json.dumps({
                "threshold": thr, "batch": batch, "buckets": n_buckets,
                "num_slots": compiled.lowered.num_slots,
                "num_edges": compiled.lowered.num_edges,
                "padded_elements": padded_elements(compiled.lowered),
                "samples_per_s": round(sps, 1),
                "anchor_rel": (abs(anchor - ref) / max(abs(ref), 1e-30)
                               if not fused_loop else None),
            }), flush=True)


if __name__ == "__main__":
    main()
