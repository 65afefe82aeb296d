"""Per-phase device-time attribution of the production MC pass (VERDICT r3 #1).

Runs the default bench configuration (order-4 Gamma4, fused lowering, the
on-device MC loop at batch 1536) under ``jax.profiler.trace`` and aggregates
the device-side XLA-op durations by pipeline phase, using the named-scope
metadata the evaluator and leaf kernels emit (``tf_op`` in the trace):

- prng      : per-iteration threefry sampling (vk, vt)
- loops     : LoopPool matmul + |q|^2
- leafG*/V* : physics kernels per (type, derivative order)
- gLNN/...  : graph-eval level NN, by bucket shape
- accum     : root accumulation
- other     : copies, infeed, anything unattributed

Usage: python benchmarks/profile_pass.py [order] [batch] [iters]
Writes the aggregate table to stdout; per-level detail with --levels.
"""
import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_mc_chunk(order: int, batch: int, iters: int):
    import jax
    import jax.numpy as jnp

    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace
    from feynmandiagram_tpu.backends.compile import compile_evaluator

    on_tpu = jax.devices()[0].platform != "cpu"
    dtype = jnp.float32 if on_tpu else jnp.float64
    para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    df = vertex4(para)
    roots = [row["diagram"] for row in df]
    optimize_inplace(roots, level=1)
    compiled = compile_evaluator(roots, max_loop_num=para.totalLoopNum,
                                 beta=0.5, kF=1.919, lam=1.0, dtype=dtype)
    num_tau = para.totalTauNum

    @jax.jit
    def mc_chunk(key):
        def body(i, acc):
            with jax.named_scope("prng"):
                k1, k2 = jax.random.split(jax.random.fold_in(key, i))
                vk = jax.random.normal(k1, (3, para.totalLoopNum, batch), dtype)
                vt = jax.random.uniform(k2, (num_tau, batch), dtype) * 0.5
            roots_v = compiled.fn(vk, vt)
            with jax.named_scope("accum"):
                return acc + jnp.sum(roots_v, axis=1)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros(
            (len(compiled.lowered.root_slots),), dtype))

    return mc_chunk, compiled


PHASE_RES = [
    ("prng", re.compile(r"/prng/")),
    ("loops", re.compile(r"/loops/")),
    ("leaf", re.compile(r"/leaf[GV]\d+/")),
    ("graph", re.compile(r"/gL\d+/")),
    ("accum", re.compile(r"/accum/")),
]
LEVEL_RE = re.compile(r"/(gL\d+)/(?:([a-z]+[\dx]*)/)?")
LEAF_RE = re.compile(r"/(leaf[GV]\d+)/")


def collect_trace(trace_dir: str):
    """Parse the newest trace.json.gz: device XLA-op events only."""
    paths = sorted(glob.glob(os.path.join(trace_dir, "**/*.trace.json.gz"),
                             recursive=True))
    with gzip.open(paths[-1]) as fh:
        d = json.load(fh)
    ev = d["traceEvents"]
    # find the device pid and its "XLA Ops" tid
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    return [e for e in ev if e.get("ph") == "X"
            and (e.get("pid"), e.get("tid")) in op_tids]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    show_levels = "--levels" in sys.argv
    order = int(args[0]) if len(args) > 0 else 4
    batch = int(args[1]) if len(args) > 1 else 1536
    iters = int(args[2]) if len(args) > 2 else 20

    import jax

    mc_chunk, compiled = build_mc_chunk(order, batch, iters)
    key = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    jax.block_until_ready(mc_chunk(key))
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    t0 = time.perf_counter()
    jax.block_until_ready(mc_chunk(jax.random.PRNGKey(1)))
    wall = time.perf_counter() - t0

    trace_dir = tempfile.mkdtemp(prefix="fdtpu_prof_")
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(mc_chunk(jax.random.PRNGKey(2)))

    events = collect_trace(trace_dir)
    by_phase = defaultdict(lambda: [0.0, 0, 0, 0])   # dur_us, count, bytes, flops
    by_level = defaultdict(lambda: [0.0, 0])
    by_op = defaultdict(lambda: [0.0, 0])
    for e in events:
        a = e.get("args", {})
        tf_op = a.get("tf_op", "")
        dur = e.get("dur", 0.0)
        phase = "other"
        for name, rx in PHASE_RES:
            if rx.search(tf_op):
                phase = name
                break
        rec = by_phase[phase]
        rec[0] += dur
        rec[1] += 1
        rec[2] += int(a.get("raw_bytes_accessed", 0))
        rec[3] += int(a.get("model_flops", 0) if a.get("model_flops", "") else 0)
        if phase == "other":
            k = e.get("name", "?").split(".")[0]
            by_op[k][0] += dur
            by_op[k][1] += 1
        m = LEVEL_RE.search(tf_op) or LEAF_RE.search(tf_op)
        if m:
            key_l = "/".join(g for g in m.groups() if g)
            by_level[key_l][0] += dur
            by_level[key_l][1] += 1

    total_us = sum(v[0] for v in by_phase.values())
    print(f"# order={order} batch={batch} iters={iters} "
          f"slots={compiled.lowered.num_slots} edges={compiled.lowered.num_edges} "
          f"levels={len(compiled.lowered.levels)}")
    print(f"# wall(untr.) {wall*1e3:.2f} ms total; device-op total "
          f"{total_us/1e3:.2f} ms; per pass {total_us/iters:.0f} us "
          f"({batch*iters/wall:.0f} samples/s untraced)")
    print(f"{'phase':<8} {'us/pass':>9} {'%':>6} {'ops/pass':>9} "
          f"{'GB/s':>8} {'GFLOP/s':>9}")
    for name in ["prng", "loops", "leaf", "graph", "accum", "other"]:
        if name not in by_phase:
            continue
        dur, cnt, byts, flops = by_phase[name]
        bw = byts / (dur * 1e-6) / 1e9 if dur else 0
        fl = flops / (dur * 1e-6) / 1e9 if dur else 0
        print(f"{name:<8} {dur/iters:>9.1f} {100*dur/total_us:>5.1f}% "
              f"{cnt/iters:>9.1f} {bw:>8.1f} {fl:>9.1f}")
    if show_levels:
        print("\n# per level/bucket (us/pass):")
        for k in sorted(by_level):
            dur, cnt = by_level[k]
            print(f"{k:<24} {dur/iters:>9.1f} {cnt/iters:>7.1f}")
    print("\n# top unattributed ops (us/pass):")
    for k, (dur, cnt) in sorted(by_op.items(), key=lambda kv: -kv[1][0])[:10]:
        print(f"{k:<32} {dur/iters:>9.1f} {cnt/iters:>7.1f}")


if __name__ == "__main__":
    main()
