"""Pallas bucket kernel: correctness in interpreter mode (compiled-mode
Mosaic limitations documented in ops/kernels.py)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from feynmandiagram_tpu.ops.kernels import bucket_gather_reduce


@pytest.mark.timeout(300)
def test_bucket_gather_reduce_interpret():
    rng = np.random.default_rng(0)
    S, B, A, C = 16, 128, 2, 8
    w = rng.random((S, B)).astype(np.float32)
    idx = rng.integers(0, S, (A, C)).astype(np.int32)
    fac = rng.choice([1.0, -1.0, 0.5], (A, C)).astype(np.float32)
    out = np.asarray(bucket_gather_reduce(jnp.asarray(w), idx, fac,
                                          interpret=True))
    expected = np.einsum("ac,acb->cb", fac, w[idx])
    np.testing.assert_allclose(out, expected, rtol=1e-6)
