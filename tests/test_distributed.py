"""Multi-controller bring-up test: two real processes, one global mesh.

Exercises utils.distributed.initialize_distributed the way a TPU-pod host
process would (SURVEY §5.8): each process owns one CPU device, the global
mesh spans both, and a psum over the mesh reduces across process
boundaries (Gloo collectives on CPU; ICI/DCN on a real pod).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = """
import sys
proc_id = int(sys.argv[1])
from feynmandiagram_tpu.utils.distributed import initialize_distributed
initialize_distributed("localhost:{port}", 2, proc_id)
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map
mesh = Mesh(np.asarray(jax.devices()), ("x",))
f = jax.jit(shard_map(lambda a: jax.lax.psum(a, "x"),
                      mesh=mesh, in_specs=P("x"), out_specs=P()))
out = np.asarray(f(jnp.arange(2, dtype=jnp.float32)))
assert float(out[0]) == 1.0, out  # 0 + 1
print("proc", proc_id, "ok")
"""


@pytest.mark.timeout(180)
def test_two_process_psum(tmp_path):
    port = 29581
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    script = _WORKER.format(port=port)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=150)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} ok" in out
