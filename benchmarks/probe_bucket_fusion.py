"""Probe: XLA fusion strategies for the padded sum-bucket op.

Hot op: out[c, :] = sum_a fac[a, c] * w[idx[a, c], :]  (w: [S, B] in HBM).

probe_gather.py showed plain row-gather w[idx] runs at ~95% of streaming
bandwidth but the one-shot `(w[idx2] * fac[:, :, None]).sum(0)` drops to
~40%: XLA materializes the gathered [A*C, B] array and re-reads it for the
multiply-reduce.  This probes formulations that avoid the materialization.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

S = 32768
B = 4096
A = 8           # bucket arity
C = 8192        # bucket count -> E = A*C = 65536 edges
E = A * C

rng = np.random.default_rng(0)
w = jax.device_put(rng.standard_normal((S, B)).astype(np.float32))
idx2 = jax.device_put(rng.integers(0, S, size=(A, C)).astype(np.int32))
fac2 = jax.device_put(rng.standard_normal((A, C)).astype(np.float32))


def bench(name, f, *args, iters=20, bytes_opt=None):
    out = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    eps = E * B / dt / 1e9
    extra = f"  ({bytes_opt / dt / 1e9:7.1f} GB/s of optimal traffic)" if bytes_opt else ""
    print(f"{name:44s} {dt*1e3:8.2f} ms   {eps:8.1f} G edge/s{extra}")
    return dt


OPT = (E + C) * B * 4  # optimal: read each edge row once, write each output row once


@jax.jit
def baseline(w, idx2, fac2):
    return jnp.sum(w[idx2] * fac2[:, :, None], axis=0)


@jax.jit
def unrolled(w, idx2, fac2):
    acc = w[idx2[0]] * fac2[0][:, None]
    for a in range(1, A):
        acc = acc + w[idx2[a]] * fac2[a][:, None]
    return acc


@jax.jit
def scanned(w, idx2, fac2):
    def body(acc, af):
        i, f = af
        return acc + w[i] * f[:, None], None
    acc, _ = jax.lax.scan(body, jnp.zeros((C, B), jnp.float32), (idx2, fac2))
    return acc


@jax.jit
def einsum_form(w, idx2, fac2):
    return jnp.einsum("ac,acb->cb", fac2, w[idx2])


@jax.jit
def segsum(w, idx_flat, fac_flat, seg):
    contrib = w[idx_flat] * fac_flat[:, None]
    return jax.ops.segment_sum(contrib, seg, num_segments=C, indices_are_sorted=True)


idx_flat = jax.device_put(np.asarray(idx2).T.reshape(-1))       # edge order: by dest
fac_flat = jax.device_put(np.asarray(fac2).T.reshape(-1))
seg = jax.device_put(np.repeat(np.arange(C, dtype=np.int32), A))

wb = w.astype(jnp.bfloat16)


@jax.jit
def unrolled_bf16(wb, idx2, fac2):
    acc = wb[idx2[0]].astype(jnp.float32) * fac2[0][:, None]
    for a in range(1, A):
        acc = acc + wb[idx2[a]].astype(jnp.float32) * fac2[a][:, None]
    return acc


print(f"E={E} edges, C={C} outputs, B={B} lanes; optimal traffic {OPT/1e9:.2f} GB")
bench("baseline (w[idx2]*fac).sum(0)", baseline, w, idx2, fac2, bytes_opt=OPT)
bench("unrolled per-arity gather-mul-add", unrolled, w, idx2, fac2, bytes_opt=OPT)
bench("scan per-arity", scanned, w, idx2, fac2, bytes_opt=OPT)
bench("einsum ac,acb->cb", einsum_form, w, idx2, fac2, bytes_opt=OPT)
bench("CSR segment_sum (sorted)", segsum, w, idx_flat, fac_flat, seg, bytes_opt=OPT)
bench("unrolled bf16-storage f32-acc", unrolled_bf16, wb, idx2, fac2,
      bytes_opt=(E + 2 * C) * B * 2)
