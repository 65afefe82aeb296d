"""Benchmark: MC samples/s on the fused order-4 vertex-4 evaluation.

BASELINE config: order-4 Gamma4 parquet graph -> optimize(level=1) -> lower
-> fused leaf+graph evaluation of Monte-Carlo sample batches on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is
self-relative to the round-1 TPU v5e-1chip pin below.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# round-1 pin: samples/s on one TPU v5e chip (first CSR measurement, batch 8192)
# (first measured value of this implementation; vs_baseline = value / pin)
PIN_SAMPLES_PER_S = 334719.0


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
    sum_mode = os.environ.get("FDTPU_BENCH_SUM_MODE", "fused")
    merge_threshold = int(os.environ.get("FDTPU_BENCH_MERGE", 0))
    layout = os.environ.get("FDTPU_BENCH_LAYOUT", "auto")
    chunk = os.environ.get("FDTPU_BENCH_CHUNK")
    compiled = compile_evaluator(roots, max_loop_num=para.totalLoopNum,
                                 beta=0.5, kF=1.919, lam=1.0, dtype=dtype,
                                 sum_mode=sum_mode, merge_threshold=merge_threshold,
                                 layout=layout,
                                 chunk_rows=int(chunk) if chunk else None)

    # batch 2048 = 16 sublane-tiles x 128 lanes: the tile-row layout
    # ([num_slots, 16, 128] weight buffer, 65 MB at order 4 — VMEM-resident)
    # is the measured sweet spot on v5e (PARITY.md batch scan + tile-layout
    # profile); tile layout needs batch % 1024 == 0.  The VMEM sizing rule
    # is recommended_batch — log its suggestion next to the chosen batch.
    from feynmandiagram_tpu.ops.evaluator import recommended_batch
    rec = recommended_batch(compiled.lowered)
    batch = int(os.environ.get("FDTPU_BENCH_BATCH", rec if rec >= 1024 else 512))
    rng = np.random.default_rng(0)
    varK = jax.device_put(rng.standard_normal((3, para.totalLoopNum, batch)).astype(np.float32))
    varT = jax.device_put((rng.random((para.totalLoopNum, batch)) * 0.5).astype(np.float32))

    reps = int(os.environ.get("FDTPU_BENCH_REPS", 3))
    # default mode is the production MC shape: sampling + leaf physics +
    # graph eval all on device under one jit (fori_loop), no host dispatch
    # per pass — measured fastest config (PARITY.md)
    fused = os.environ.get("FDTPU_BENCH_FUSED", "1") == "1"
    iters = int(os.environ.get("FDTPU_BENCH_ITERS", 200 if fused else 50))
    if fused:
        # the production MC shape (shared protocol: benchmarks/_mc_bench.py)
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
        from _mc_bench import mc_samples_per_s

        sps = mc_samples_per_s(compiled.fn, n_loop=para.totalLoopNum,
                               num_tau=para.totalTauNum, batch=batch,
                               n_roots=len(compiled.lowered.root_slots),
                               dtype=dtype, iters=iters, reps=reps, beta=0.5)
        dt = batch * iters / sps
    else:
        out = compiled(varK, varT)
        jax.block_until_ready(out)  # compile + warmup
        # median of `reps` timing repetitions: steady-state throughput,
        # robust to one-off clock ramp / tunnel hiccups
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = compiled(varK, varT)
            jax.block_until_ready(out)
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]

    samples_per_s = batch * iters / dt
    edges_per_s = compiled.lowered.num_edges * samples_per_s
    # roofline self-report (VERDICT r4 #6): every edge is one gathered row
    # operand of `batch` lanes, so gathered-row traffic = edges_per_s *
    # itemsize.  The ceiling fraction uses the measured speed-of-light of
    # the tile-row gather engine on this chip (3.2 TB/s contiguous-output
    # per-term gathers, PARITY.md profile table; traced, order-4 shapes) —
    # a TPU-only number, omitted on other platforms.  The pass also spends
    # ~29% on non-gather work, so ~0.7 is the practical ceiling.
    gathered_tb_s = edges_per_s * np.dtype(
        "float32" if on_tpu else "float64").itemsize / 1e12
    result = {
        "metric": f"mc_samples_per_s_order{order}_ver4",
        "value": round(samples_per_s, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(samples_per_s / PIN_SAMPLES_PER_S, 3),
        "extra": {
            "edges_per_s": round(edges_per_s, 0),
            "gathered_row_tb_s": round(gathered_tb_s, 3),
            **({"frac_of_measured_gather_ceiling_3p2tbs": round(
                gathered_tb_s / 3.2, 3)} if on_tpu else {}),
            "batch": batch,
            "iters": iters,
            "num_nodes": compiled.lowered.num_slots,
            "num_edges": compiled.lowered.num_edges,
            "sum_mode": sum_mode,
            "layout": layout,
            "fused": fused,
            "merge_threshold": merge_threshold,
            "recommended_batch": rec,
            "platform": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
