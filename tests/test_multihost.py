"""Multi-host (DDP) path: real 2-process jax.distributed run on CPU.

The reference has no multi-node story at all (SURVEY §2.2); here the
same jit program scales across hosts once `jax.distributed.initialize`
has run (cli.py wires it behind MLSP_MULTIHOST). This test actually
exercises that path: two OS processes form a cluster, build one global
(data x points)-style mesh over 2x2 virtual CPU devices, and run a
data-parallel gradient step whose all-reduce crosses the process
boundary; process 0 asserts the result equals the single-process
computation.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mlsp_tpu.parallel import make_mesh

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 local x 2 processes
mesh = make_mesh(jax.devices(), data=4, points=1)

B, D = 8, 16
rng = np.random.default_rng(0)
x = rng.standard_normal((B, D)).astype(np.float32)
w = rng.standard_normal((D,)).astype(np.float32)

# Global batch sharded over all 4 devices (2 per process).
xs = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), x[: B // 2] if proc_id == 0 else x[B // 2 :], x.shape)
ws = jax.device_put(w, NamedSharding(mesh, P()))

@jax.jit
def gradstep(w, x):
    # mean loss over the GLOBAL batch -> cross-process all-reduce
    return jax.grad(lambda w: jnp.mean(jnp.tanh(x @ w) ** 2))(w)

g = np.asarray(gradstep(ws, xs))  # replicated output: fetch everywhere
want = np.asarray(jax.jit(jax.grad(lambda w: jnp.mean(jnp.tanh(jnp.asarray(x) @ w) ** 2)))(jnp.asarray(w)))
np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6)
print(f"proc{proc_id} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_ddp(tmp_path):
    port = socket.socket()
    port.bind(("localhost", 0))
    coord = f"localhost:{port.getsockname()[1]}"
    port.close()

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(__file__))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out
