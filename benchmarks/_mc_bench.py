"""Shared on-device MC measurement protocol — single source of truth.

The official throughput protocol (bench.py and every benchmark that claims
"identical measurement protocol"): the whole sampling+evaluation loop runs
on device under one jit (`fori_loop`, per-iteration PRNG folding), one
warmup call, then the median of ``reps`` wall-clock repetitions.
"""
import time


def mc_samples_per_s(eval_fn, *, n_loop: int, num_tau: int, batch: int,
                     n_roots: int, dtype, iters: int = 200, reps: int = 3,
                     beta: float = 0.5) -> float:
    """Measure samples/s of ``eval_fn(varK, varT) -> roots[R, batch]``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def mc_chunk(key):
        def body(i, acc):
            k1, k2 = jax.random.split(jax.random.fold_in(key, i))
            vk = jax.random.normal(k1, (3, n_loop, batch), dtype)
            vt = jax.random.uniform(k2, (num_tau, batch), dtype) * beta
            r = eval_fn(vk, vt)
            return acc + jnp.sum(r, axis=1)

        return jax.lax.fori_loop(0, iters, body,
                                 jnp.zeros((n_roots,), dtype))

    jax.block_until_ready(mc_chunk(jax.random.PRNGKey(0)))  # compile+warmup
    times = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(mc_chunk(jax.random.PRNGKey(r)))
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    return batch * iters / dt
