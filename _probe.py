"""Compare stacked-gather bucket eval vs arity-unrolled successive adds."""
import time
import numpy as np, jax, jax.numpy as jnp
from feynmandiagram_tpu.frontends.parquet import DiagPara, Ver4Diag, vertex4
from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
from feynmandiagram_tpu.frontends.parquet import Interaction
from feynmandiagram_tpu.computational_graph import optimize_inplace
from feynmandiagram_tpu.backends.compile import leafmap_of
from feynmandiagram_tpu.ops import lower
from feynmandiagram_tpu.ops.lowering import LoweredGraph

order, batch, iters = 4, 4096, 20
para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                filter=(NoHartree,), interaction=(Interaction(ChargeCharge, Instant),))
df = vertex4(para)
roots = [r["diagram"] for r in df]
optimize_inplace(roots, level=1)
lowered = lower(roots, leafmap_of(roots), sum_mode="bucketed")

def eval_levels(w, unroll):
    for level in lowered.levels:
        for sb in level.sum_buckets:
            if unroll:
                block = w[sb.idx[0]] * sb.fac[0][:, None]
                for a in range(1, sb.idx.shape[0]):
                    block = block + w[sb.idx[a]] * sb.fac[a][:, None]
            else:
                block = jnp.sum(w[sb.idx] * sb.fac[:, :, None], axis=0)
            w = jax.lax.dynamic_update_slice_in_dim(w, block, sb.start, axis=0)
        for p in level.prods:
            block = w[p.idx[0]]
            for a in range(1, p.arity):
                block = block * w[p.idx[a]]
            block = block * p.factor[:, None]
            w = jax.lax.dynamic_update_slice_in_dim(w, block, p.start, axis=0)
        for pw in level.pows:
            block = jax.lax.integer_pow(w[pw.src], pw.n) * pw.factor[:, None]
            w = jax.lax.dynamic_update_slice_in_dim(w, block, pw.start, axis=0)
    return w[jnp.asarray(lowered.root_slots)]

nl = lowered.num_leaves - len(lowered.const_slots)
rng = np.random.default_rng(0)
leaf = jax.device_put(rng.uniform(0.5, 1.5, (nl, batch)).astype(np.float32))
cv = jnp.asarray(lowered.const_values, jnp.float32)

def make(unroll):
    def f(lv):
        w = jnp.zeros((lowered.num_slots, batch), jnp.float32)
        w = jax.lax.dynamic_update_slice_in_dim(w, lv, 0, axis=0)
        if len(lowered.const_slots):
            w = jax.lax.dynamic_update_slice_in_dim(
                w, jnp.broadcast_to(cv[:, None], (len(lowered.const_slots), batch)), nl, axis=0)
        return eval_levels(w, unroll)
    return jax.jit(f)

outs = {}
for unroll in (False, True):
    f = make(unroll)
    out = f(leaf); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(leaf)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    outs[unroll] = np.asarray(out)
    print(f"unroll={unroll}: {dt*1e3:.2f} ms, {batch/dt/1e3:.1f}k samples/s", flush=True)
print("max abs diff:", np.abs(outs[False] - outs[True]).max())
