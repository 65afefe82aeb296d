"""Scaling-efficiency harness (BASELINE: ">=90% scaling efficiency 1->N").

Measures, for device counts 1..N on the available mesh:

- sample axis (data parallel): samples/s for the fused order-`ORDER`
  vertex-4 pipeline at fixed total batch (strong scaling);
- graph axis (memory-partitioned): edges/s through the graph-sharded
  evaluator, plus the planner's exact per-level halo traffic and an
  analytic ICI-time model (bytes / ICI bandwidth), which is the
  hardware-independent part of the scaling story.

On this environment multi-chip TPU hardware is not available: with
JAX_PLATFORMS=cpu the harness runs on a virtual N-device host mesh, which
validates the *mechanics* (the collectives run, the numbers agree) and
measures parallelization overhead — it does NOT measure hardware scaling,
because all virtual devices time-share the host cores.  The measured
single-chip rate lives in bench.py/BENCH_r*.json; the ICI model below is
the projection for a real multi-chip mesh.  Run this same script unchanged
on a pod slice to get true scaling numbers.

Usage: python benchmarks/scaling.py [--devices 8] [--order 3] [--batch 1024]
Prints one JSON line per measurement plus a markdown table.
"""
import argparse
import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _force_cpu_mesh():
    """Select the virtual host mesh regardless of env-level platform config
    (jax may already be imported by the container's sitecustomize)."""
    import jax
    jax.config.update("jax_platforms", "cpu")

# v5e ICI: 4 links/chip x ~400 GB/s/link bidirectional aggregate ~1.6 TB/s;
# conservative usable per-chip all_gather bandwidth
ICI_GBPS = 400.0


def build(order: int):
    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace

    para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    roots = [row["diagram"] for row in vertex4(para)]
    optimize_inplace(roots, level=1)
    return roots, para


def sample_axis_points(roots, para, device_counts, batch_total, iters):
    """samples/s at fixed total batch, sample-axis DP over n devices."""
    import jax
    from feynmandiagram_tpu.backends.compile import compile_evaluator
    from feynmandiagram_tpu.parallel import make_sample_mesh, shard_compiled

    compiled = compile_evaluator(roots, max_loop_num=para.totalLoopNum,
                                 beta=0.5, kF=1.919, lam=1.0)
    rng = np.random.default_rng(0)
    varK = rng.standard_normal((3, para.totalLoopNum, batch_total)).astype(np.float32)
    varT = (rng.random((para.totalLoopNum, batch_total)) * 0.5).astype(np.float32)

    points = []
    for n in device_counts:
        mesh = make_sample_mesh(n)
        fn = shard_compiled(compiled, mesh)
        jax.block_until_ready(fn(varK, varT))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(varK, varT)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        points.append({"axis": "sample", "devices": n,
                       "samples_per_s": round(batch_total * iters / dt, 1)})
    return points


def graph_axis_points(roots, para, device_counts, batch, iters):
    """edges/s through the memory-partitioned graph-sharded evaluator,
    plus exact per-level halo traffic from the planner."""
    import jax
    from feynmandiagram_tpu.backends.compile import leafmap_of
    from feynmandiagram_tpu.ops import lower
    from feynmandiagram_tpu.parallel import make_sample_mesh
    from feynmandiagram_tpu.parallel.graph_shard import make_graph_sharded_evaluator

    leafmap = leafmap_of(roots)
    lowered = lower(roots, leafmap, sum_mode="fused", cse=True,
                    reuse_slots=False)
    nl = lowered.num_leaves - len(lowered.const_slots)
    rng = np.random.default_rng(1)
    vals = rng.uniform(0.5, 1.5, (nl, batch)).astype(np.float32)

    points = []
    for n in device_counts:
        mesh = make_sample_mesh(n, axis_name="graph")
        fn = make_graph_sharded_evaluator(lowered, mesh)
        jax.block_until_ready(fn(vals))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(vals)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        s = fn.stats
        halo_bytes = s.halo_bytes_per_sample(4) * batch
        ici_ms = halo_bytes / (ICI_GBPS * 1e9) * 1e3
        points.append({
            "axis": "graph", "devices": n,
            "edges_per_s": round(lowered.num_edges * batch * iters / dt, 0),
            "local_slots": s.local_slots, "full_slots": s.full_slots,
            "mem_ratio": round(s.local_slots / s.full_slots, 4),
            "halo_MB_per_pass": round(halo_bytes / 1e6, 3),
            "ici_model_ms_per_pass": round(ici_ms, 4),
        })
    return points


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--order", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--native", action="store_true",
                    help="use the native platform (real TPU) instead of the "
                         "virtual CPU mesh")
    args = ap.parse_args()

    if not args.native:
        _force_cpu_mesh()
    import jax
    avail = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16) if n <= min(args.devices, avail)]
    print(f"# platform={jax.devices()[0].platform} devices={avail} "
          f"counts={counts} order={args.order}", file=sys.stderr)

    roots, para = build(args.order)
    pts = sample_axis_points(roots, para, counts, args.batch, args.iters)
    pts += graph_axis_points(roots, para, counts, max(args.batch // 4, 64),
                             args.iters)
    for p in pts:
        print(json.dumps(p))

    base_s = next(p for p in pts if p["axis"] == "sample")["samples_per_s"]
    base_g = next(p for p in pts if p["axis"] == "graph")["edges_per_s"]
    print("\n| axis | devices | rate | speedup | efficiency |")
    print("|---|---|---|---|---|")
    for p in pts:
        if p["axis"] == "sample":
            sp = p["samples_per_s"] / base_s
            print(f"| sample | {p['devices']} | {p['samples_per_s']:.0f} samp/s "
                  f"| {sp:.2f}x | {sp / p['devices']:.0%} |")
        else:
            sp = p["edges_per_s"] / base_g
            print(f"| graph | {p['devices']} | {p['edges_per_s']:.2e} edge/s "
                  f"| {sp:.2f}x | {sp / p['devices']:.0%} |")


if __name__ == "__main__":
    main()
