"""Statically screened (Yukawa) interaction and its counterterm powers.

V(q; lam) = 8*pi / (q^2 + lam), the convention of the reference test oracle
(test/front_end.jl:327-331).  The interaction-counterterm leaf at order n
follows the renormalized-lambda power convention of the reference MC
examples: V * (lam / (q^2 + lam))^n.

NOTE: example/benchmark.jl:77 literally computes ``8pi / invK * (...)`` with
invK = 1/(q^2+lam), i.e. 8pi*(q^2+lam); that inverts the interaction and is
taken to be a typo — the standard convention ``8pi * invK`` is used here.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

EIGHT_PI = 8.0 * math.pi


def yukawa_interaction(q2, lam):
    return EIGHT_PI / (q2 + lam)


def interaction_derive(q2, lam, order: int, *, convention: str = "lambda_power"):
    """Interaction-counterterm leaf value at derivative order ``order``.

    - 'lambda_power': V * (lam/(q^2+lam))^order (reference MC convention)
    - 'taylor':      1/n! d^n/d lam^n V = (-1)^n * 8pi/(q^2+lam)^(n+1)
    """
    inv = 1.0 / (jnp.asarray(q2) + lam)
    if convention == "lambda_power":
        return EIGHT_PI * inv * (lam * inv) ** order
    if convention == "taylor":
        return ((-1.0) ** order) * EIGHT_PI * inv ** (order + 1)
    raise ValueError(f"unknown convention {convention}")
