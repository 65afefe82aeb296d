import time
import numpy as np, jax, jax.numpy as jnp
from feynmandiagram_tpu.frontends.parquet import DiagPara, Ver4Diag, vertex4
from feynmandiagram_tpu.frontends import ChargeCharge, Instant, NoHartree
from feynmandiagram_tpu.frontends.parquet import Interaction
from feynmandiagram_tpu.computational_graph import optimize_inplace
from feynmandiagram_tpu.backends.compile import compile_evaluator

order, batch, iters = 4, 4096, 20
para = DiagPara(type=Ver4Diag, innerLoopNum=order, hasTau=True,
                filter=(NoHartree,), interaction=(Interaction(ChargeCharge, Instant),))
df = vertex4(para)
roots = [r["diagram"] for r in df]
optimize_inplace(roots, level=1)

rng = np.random.default_rng(0)
varK = jax.device_put(rng.standard_normal((3, para.totalLoopNum, batch)).astype(np.float32))
varT = jax.device_put((rng.random((para.totalLoopNum, batch)) * 0.5).astype(np.float32))

def run(tag, **kw):
    comp = compile_evaluator(roots, max_loop_num=para.totalLoopNum, beta=0.5,
                             kF=1.919, lam=1.0, dtype=jnp.float32,
                             sum_mode="bucketed", **kw)
    out = comp(varK, varT); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = comp(varK, varT)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    print(f"{tag}: {batch*iters/dt/1e3:.1f}k samples/s", flush=True)
    return np.asarray(out, np.float64)

a = run("f32")
b = run("bf16-storage/f32-acc", graph_dtype=jnp.bfloat16, acc_dtype=jnp.float32)
rel = np.abs(a - b) / (np.abs(a) + 1e-30)
print("median rel err:", np.median(rel), " p99:", np.quantile(rel, 0.99))
