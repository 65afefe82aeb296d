"""On-chip scan of fused-bucket coalescing (merge_threshold) x batch size.

Generates/optimizes the order-4 vertex4 graph ONCE, then compiles and times
the fused evaluator per configuration.  Prints one JSON line per config:
threshold, batch, bucket count (device ops per pass), samples/s.
"""
import json
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
        "FDTPU_SCAN_THRESHOLDS", "0,500,1000,2000,5000,10000,30000").split(",")]
    batches = [int(x) for x in os.environ.get(
        "FDTPU_SCAN_BATCHES", "4096,8192").split(",")]
    iters = int(os.environ.get("FDTPU_BENCH_ITERS", 20))
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
            out = compiled(varK, varT)
            jax.block_until_ready(out)  # compile + warmup
            t0 = time.perf_counter()
            for _ in range(iters):
                out = compiled(varK, varT)
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            sps = batch * iters / dt
            # equivalence anchor: mean over lanes of root 0 at thr vs thr[0]
            anchor = float(np.asarray(out)[0].mean())
            ref = ref_out.setdefault(batch, anchor)
            print(json.dumps({
                "threshold": thr, "batch": batch, "buckets": n_buckets,
                "num_slots": compiled.lowered.num_slots,
                "num_edges": compiled.lowered.num_edges,
                "samples_per_s": round(sps, 1),
                "anchor_rel": abs(anchor - ref) / max(abs(ref), 1e-30),
            }), flush=True)


if __name__ == "__main__":
    main()
