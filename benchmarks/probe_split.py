"""Split timing: leaf phase vs graph phase; CSE on/off edge counts."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
from feynmandiagram_tpu.frontends.parquet import DiagPara, Interaction, Ver4Diag, vertex4
from feynmandiagram_tpu.computational_graph import optimize_inplace
from feynmandiagram_tpu.backends.compile import leafmap_of, leaf_graphs_of
from feynmandiagram_tpu.ops.lowering import lower
from feynmandiagram_tpu.ops.leaf_eval import leaf_tables_from_lowered, make_leaf_evaluator
from feynmandiagram_tpu.ops.evaluator import make_evaluator

order = 4
para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                filter=(NoHartree,),
                interaction=(Interaction(ChargeCharge, Instant),))
df = vertex4(para)
roots = [row["diagram"] for row in df]
optimize_inplace(roots, level=1)

leafmap = leafmap_of(roots)
for cse in (False, True):
    low = lower(roots, leafmap, sum_mode="bucketed", cse=cse)
    print(f"cse={cse}: slots={low.num_slots} leaves={low.num_leaves} "
          f"edges={low.num_edges} levels={low.num_levels}")

low = lower(roots, leafmap, sum_mode="bucketed", cse=True)
tables = leaf_tables_from_lowered(low, leaf_graphs_of(roots), para.totalLoopNum)
dtype = jnp.float32
leaf_fn = jax.jit(make_leaf_evaluator(tables, beta=0.5, kF=1.919, lam=1.0, dtype=dtype))
graph_fn = jax.jit(make_evaluator(low, dtype=dtype, jit=False))

batch = 4096
rng = np.random.default_rng(0)
varK = jax.device_put(rng.standard_normal((3, para.totalLoopNum, batch)).astype(np.float32))
varT = jax.device_put((rng.random((para.totalLoopNum, batch)) * 0.5).astype(np.float32))

lv = jax.block_until_ready(leaf_fn(varK, varT))
out = jax.block_until_ready(graph_fn(lv))

def t(f, *a, iters=30):
    jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters

tl = t(leaf_fn, varK, varT)
tg = t(graph_fn, lv)
print(f"leaf phase : {tl*1e3:7.2f} ms  ({batch/tl/1e3:.0f}k samples/s)")
print(f"graph phase: {tg*1e3:7.2f} ms  ({batch/tg/1e3:.0f}k samples/s)")
print(f"combined   : {(tl+tg)*1e3:7.2f} ms  ({batch/(tl+tg)/1e3:.0f}k samples/s)")
# traffic estimate for graph phase
traffic = (low.num_edges + (low.num_slots - low.num_leaves)) * batch * 4 * 1.0
print(f"graph-phase traffic ~{traffic/1e9:.2f} GB -> {traffic/tg/1e9:.0f} GB/s")
