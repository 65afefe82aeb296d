"""Sweep the tile-layout evaluator knobs on the production MC loop.

Builds the order-N vertex4 pipeline once, then times the on-device MC
chunk for combinations of (batch, chunk_rows, split_count), monkeypatching
the tile-path defaults.  Prints one JSON line per config.

Usage: FDTPU_SWEEP_BATCHES=2048,3072 FDTPU_SWEEP_CHUNKS=256,512,1024 \
       python benchmarks/sweep_tile.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    import feynmandiagram_tpu.ops.evaluator as E
    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace
    from feynmandiagram_tpu.backends.compile import compile_evaluator

    dtype = jnp.float32
    order = int(os.environ.get("FDTPU_BENCH_ORDER", 4))
    para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    df = vertex4(para)
    roots = [row["diagram"] for row in df]
    optimize_inplace(roots, level=1)

    batches = [int(x) for x in os.environ.get(
        "FDTPU_SWEEP_BATCHES", "2048,3072").split(",")]
    chunks = [int(x) for x in os.environ.get(
        "FDTPU_SWEEP_CHUNKS", "256,512,1024").split(",")]
    splits = [int(x) for x in os.environ.get(
        "FDTPU_SWEEP_SPLITS", "64").split(",")]
    iters = int(os.environ.get("FDTPU_BENCH_ITERS", 100))
    num_tau = para.totalTauNum
    orig = E._eval_levels_tile

    for chunk_rows in chunks:
        for split_count in splits:
            E._eval_levels_tile = functools.partial(
                orig, unroll_max=8, split_count=split_count,
                chunk_rows=chunk_rows)
            compiled = compile_evaluator(
                roots, max_loop_num=para.totalLoopNum, beta=0.5, kF=1.919,
                lam=1.0, dtype=dtype)
            for batch in batches:
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
                print(json.dumps({
                    "batch": batch, "chunk_rows": chunk_rows,
                    "split_count": split_count,
                    "samples_per_s": round(batch * iters / dt, 1),
                }), flush=True)
    E._eval_levels_tile = orig


if __name__ == "__main__":
    main()
