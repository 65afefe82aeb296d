"""Free-fermion imaginary-time propagator and its frequency-derivative tower.

G(tau, eps, beta) is the fermionic kernel (the equivalent of
Lehmann.Spectral.kernelFermiT used by the reference MC examples,
example/benchmark.jl:113-127):

    tau in (0, beta]:   G =  exp(-eps*tau) / (1 + exp(-eps*beta))
    tau in (-beta, 0]:  G = -exp(-eps*tau) / (1 + exp( eps*beta))

implemented in overflow-free softplus form, branch-selected with the
double-where trick so nested ``jax.grad`` derivatives stay NaN-free.  The
counterterm tower ``green_derive(tau, eps, beta, n)`` returns
(-1)^n / n! * d^n G / d eps^n (example/benchmark.jl:93-111).
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp

TAU_CUTOFF = 1e-10
MAX_DERIV_ORDER = 5


def _green_scalar(tau, eps, beta):
    # tau == 0 is interpreted as tau -> 0^- (reference convention)
    tau = jnp.where(jnp.abs(tau) < TAU_CUTOFF, -TAU_CUTOFF, tau)
    pos = tau > 0
    # double-where: never evaluate a branch with out-of-range tau
    tau_p = jnp.where(pos, tau, beta * 0.5)
    tau_m = jnp.where(pos, -beta * 0.5, tau)
    # exp(-eps*tau) * sigmoid(eps*beta)   [tau > 0]
    g_pos = jnp.exp(-eps * tau_p - jax.nn.softplus(-eps * beta))
    # -exp(-eps*tau) * sigmoid(-eps*beta) [tau <= 0]
    g_neg = -jnp.exp(-eps * tau_m - jax.nn.softplus(eps * beta))
    return jnp.where(pos, g_pos, g_neg)


@lru_cache(maxsize=None)
def _deriv_fn(order: int):
    """d^order/d eps^order of the scalar kernel, as a vectorized function."""
    fn = _green_scalar
    for _ in range(order):
        fn = jax.grad(fn, argnums=1)
    return jnp.vectorize(fn)


def green_kernel(tau, eps, beta):
    """Batched stable fermionic kernel G(tau, eps, beta)."""
    return _green_scalar(jnp.asarray(tau), jnp.asarray(eps), beta)


def green_derive_tower(tau, eps, beta, order: int):
    """(-1)^n / n! * d^n G / d eps^n — the G-counterterm leaf value at
    derivative order ``n`` (reference green_derive)."""
    if not (0 <= order <= MAX_DERIV_ORDER):
        raise ValueError(f"derivative order {order} not supported")
    val = _deriv_fn(order)(jnp.asarray(tau), jnp.asarray(eps), beta)
    return val * ((-1.0) ** order / math.factorial(order))
