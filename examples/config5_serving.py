"""BASELINE config-5 workflow: generate once, serve sharded.

Job 1 (generation, any host): build the order-N vertex-4 graph via parquet,
optimize, lower with single-assignment slots, export one .npz artifact.

Job 2 (serving, a TPU pod slice): load the artifact — no parquet, no
symbolic graphs — and run the Monte-Carlo estimation step with the graph
memory-partitioned over the ``graph`` mesh axis and samples data-parallel
over the ``batch`` axis.

On this container the mesh is the virtual 8-device CPU mesh; run unchanged
on a real slice for hardware scaling.  Usage:

    python examples/config5_serving.py [order] [artifact.npz]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# append (not setdefault) so a pre-set XLA_FLAGS still gets the virtual
# device count the 8-device mesh below needs (ADVICE r4 #3)
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def generate(order: int, path: str, n_graph: int = 4) -> None:
    from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
    from feynmandiagram_tpu.frontends.parquet import (DiagPara, Interaction,
                                                      Ver4Diag, vertex4)
    from feynmandiagram_tpu.computational_graph import optimize_inplace
    from feynmandiagram_tpu.backends.compile import (leafmap_of,
                                                     leaf_graphs_of,
                                                     save_lowered)
    from feynmandiagram_tpu.ops.leaf_eval import leaf_tables_from_lowered
    from feynmandiagram_tpu.parallel.graph_shard import lower_sharded_best

    t0 = time.time()
    para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                    filter=(NoHartree,),
                    interaction=(Interaction(ChargeCharge, Instant),))
    roots = [row["diagram"] for row in vertex4(para)]
    optimize_inplace(roots, level=1)
    # generate-once: lower under BOTH level schedules and keep the plan
    # with the smaller per-device footprint on the serving graph axis
    lowered, sched = lower_sharded_best(roots, leafmap_of(roots), n_graph,
                                        cse=True)
    tables = leaf_tables_from_lowered(lowered, leaf_graphs_of(roots),
                                      para.totalLoopNum)
    save_lowered(path, lowered, tables)
    print(f"[generate] order {order}: {len(roots)} roots "
          f"(schedule={sched}) -> {path} "
          f"({os.path.getsize(path)/2**20:.1f} MB) in {time.time()-t0:.1f} s")


def serve(path: str, batch_per_device: int = 8, iters: int = 4) -> None:
    import jax

    # a real pod slice has >= 8 default devices; anywhere else (incl. this
    # container, where a plugin may force a 1-chip platform regardless of
    # JAX_PLATFORMS) build the mesh from the virtual 8-device CPU backend
    # explicitly — meshes pin their own devices, no platform switch needed
    devs = jax.devices()
    if len(devs) < 8:
        devs = jax.devices("cpu")
        assert len(devs) >= 8, (
            "need 8 devices; ensure XLA_FLAGS includes "
            "--xla_force_host_platform_device_count=8")
    from jax.sharding import Mesh
    from feynmandiagram_tpu.backends.compile import load_artifact
    from feynmandiagram_tpu.parallel import make_graph_sharded_mc_step

    lowered, tables = load_artifact(path)
    devices = np.asarray(devs[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("graph", "batch"))
    step = make_graph_sharded_mc_step(lowered, tables, mesh,
                                      beta=0.5, kF=1.919, lam=1.0)
    st = step.stats
    print(f"[serve] {lowered.num_slots} slots -> {st.local_slots}/device "
          f"on a {dict(zip(mesh.axis_names, mesh.devices.shape))} mesh; "
          f"halo {st.halo_bytes_per_sample()/1024:.1f} KiB/sample "
          f"(pad {st.halo_pad_overhead:.3f}, early {st.early_share:.2f})")
    t0 = time.time()
    means = np.asarray(step(jax.random.PRNGKey(0), batch_per_device, iters))
    dt = time.time() - t0
    n = batch_per_device * iters * mesh.shape["batch"]
    print(f"[serve] {n} samples in {dt:.1f} s (incl. compile); "
          f"first root means: {means[:4]}")


def main():
    # default = order 5, the near-named config-5 scale (order 6 runs the
    # same path, ~8x the host generation and compile time)
    order = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    path = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/ver4_o{order}.npz"
    if not os.path.exists(path):
        generate(order, path)
    serve(path)


if __name__ == "__main__":
    main()
