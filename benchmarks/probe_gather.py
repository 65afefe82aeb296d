"""Micro-benchmark: gather-row throughput strategies on one TPU chip.

The leveled evaluator's hot op is: out[c, B] = reduce(w[idx] * fac) where
w is [S, B] in HBM and idx is an arbitrary int32 row-index array.  This
probes the achievable HBM bandwidth of several gather engines.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

S = 32768       # slots
B = 4096        # batch (lanes)
E = 65536       # gathered rows

rng = np.random.default_rng(0)
w = jax.device_put(rng.standard_normal((S, B)).astype(np.float32))
idx = jax.device_put(rng.integers(0, S, size=E).astype(np.int32))
idx_sorted = jax.device_put(np.sort(np.asarray(idx)))
fac = jax.device_put(rng.standard_normal(E).astype(np.float32))

def bench(name, f, *args, iters=20):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    gb = E * B * 4 / 1e9  # bytes gathered (read traffic only)
    print(f"{name:40s} {dt*1e3:8.2f} ms   {gb/dt:8.1f} GB/s")
    return dt

@jax.jit
def plain(w, idx):
    return w[idx]

@jax.jit
def take(w, idx):
    return jnp.take(w, idx, axis=0)

@jax.jit
def promise(w, idx):
    return w.at[idx].get(mode="promise_in_bounds")

@jax.jit
def promise_sorted(w, idx):
    return w.at[idx].get(mode="promise_in_bounds", indices_are_sorted=True)

@jax.jit
def gather_scale_sum(w, idx, fac):
    # bucket shape: arity 8 x count E/8
    g = w.at[idx].get(mode="promise_in_bounds") * fac[:, None]
    return jnp.sum(g.reshape(8, E // 8, B), axis=0)

@jax.jit
def copy_rows(w):
    # pure sequential read+write roofline proxy
    return w * 2.0

bench("w*2 (streaming roofline, S rows)", copy_rows, w)
bench("w[idx]", plain, w, idx)
bench("jnp.take", take, w, idx)
bench("at[].get promise_in_bounds", promise, w, idx)
bench("promise + sorted idx", promise_sorted, w, idx_sorted)
bench("gather*fac + 8-way reduce", gather_scale_sum, w, idx, fac)

# one-hot matmul gather for a small window: out[c,B] = A[c,W] @ w[w0:w0+W]
W = 2048
C = 1024
A = np.zeros((C, W), np.float32)
A[np.arange(C), rng.integers(0, W, C)] = 1.0
A = jax.device_put(A)
win = w[:W]

@jax.jit
def onehot(A, win):
    return jnp.dot(A, win, preferred_element_type=jnp.float32)

out = jax.block_until_ready(onehot(A, win))
t0 = time.perf_counter()
for _ in range(50):
    out = onehot(A, win)
jax.block_until_ready(out)
dt = (time.perf_counter() - t0) / 50
print(f"{'one-hot matmul (C=1024,W=2048)':40s} {dt*1e3:8.2f} ms   "
      f"{C*B*4/1e9/dt:8.1f} GB/s-eq  ({2*C*W*B/dt/1e12:.1f} TF/s)")
