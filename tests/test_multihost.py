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

pytestmark = pytest.mark.e2e  # multi-process clusters



def _free_port():
    port = socket.socket()
    port.bind(("localhost", 0))
    coord = f"localhost:{port.getsockname()[1]}"
    port.close()
    return coord


def _env(local_devices: int):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}")
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(__file__))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    return env


def _run_workers(script_text, tmp_path, n_procs, local_devices, coord=None,
                 timeout=300):
    coord = coord or _free_port()
    script = tmp_path / "worker.py"
    script.write_text(script_text)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord, str(n_procs)],
            env=_env(local_devices), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(n_procs)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=timeout)
        outs.append(out)
    return procs, outs


_WORKER_N = r"""
import os, sys
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]; nprocs = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.parallel import init_distributed
init_distributed(coordinator_address=coord, num_processes=nprocs,
                 process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mlsp_tpu.parallel import make_mesh

assert jax.process_count() == nprocs, jax.process_count()
ndev = len(jax.devices())
assert ndev == 2 * nprocs  # 2 local devices per process
mesh = make_mesh(jax.devices(), data=ndev, points=1)

B, D = 4 * ndev, 16
rng = np.random.default_rng(0)
x = rng.standard_normal((B, D)).astype(np.float32)
w = rng.standard_normal((D,)).astype(np.float32)

shard = B // nprocs
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    x[proc_id * shard : (proc_id + 1) * shard], x.shape)
ws = jax.device_put(w, NamedSharding(mesh, P()))

@jax.jit
def gradstep(w, x):
    return jax.grad(lambda w: jnp.mean(jnp.tanh(x @ w) ** 2))(w)

g = np.asarray(gradstep(ws, xs))
want = np.asarray(jax.jit(jax.grad(
    lambda w: jnp.mean(jnp.tanh(jnp.asarray(x) @ w) ** 2)))(jnp.asarray(w)))
np.testing.assert_allclose(g, want, rtol=1e-5, atol=1e-6)
print(f"proc{proc_id} OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_ddp(tmp_path):
    procs, outs = _run_workers(_WORKER_N, tmp_path, 2, 2)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out




@pytest.mark.slow
def test_four_process_ddp(tmp_path):
    """4 OS processes x 2 virtual devices = an 8-device cluster; the
    cross-process gradient all-reduce must equal the single-process
    result on every rank."""
    procs, outs = _run_workers(_WORKER_N, tmp_path, 4, 2, timeout=420)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out


_WORKER_TRAINER = r"""
import os, sys
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]; nprocs = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.parallel import init_distributed, make_mesh
init_distributed(coordinator_address=coord, num_processes=nprocs,
                 process_id=proc_id)
from mlsp_tpu.train import train_pointda
from mlsp_tpu.utils.config import PointDAConfig

out = os.environ["MLSP_TEST_OUT"]
cfg = PointDAConfig(
    synthetic=True, epochs=1, batch_size=8, num_points=64,
    out_path=out, exp_name="mh", model="pointnet", apply_PCM=False,
    test_batch_size=8, scan_steps=4, save_every=1)
mesh = make_mesh(jax.devices(), data=len(jax.devices()), points=1)
state, results = train_pointda(cfg, mesh=mesh)
print(f"proc{proc_id} final {results['test']['acc']:.6f} "
      f"{results['test']['loss']:.6f}", flush=True)
"""


@pytest.mark.slow
def test_trainer_two_process(tmp_path):
    """The FULL PointDA trainer (epoch loop, scanned steps, chunked
    evals, best-model selection, periodic checkpoints) runs unchanged on
    a real 2-process cluster: both ranks complete, report identical
    final metrics, and only rank 0 owns the experiment files."""
    coord = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER_TRAINER)
    env = _env(2)
    env["MLSP_TEST_OUT"] = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord, "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    finals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        line = [l for l in out.splitlines() if f"proc{i} final" in l]
        assert line, out
        finals.append(line[0].split("final")[1])
    assert finals[0] == finals[1], finals  # replicated metrics agree
    # rank 0 owns the files; rank 1 wrote none
    assert (tmp_path / "mh" / "run.log").exists()
    assert (tmp_path / "mh" / "model.ckpt").exists()
    assert len((tmp_path / "mh" / "metrics.jsonl")
               .read_text().splitlines()) == 1
    assert "[rank 1]" not in (tmp_path / "mh" / "run.log").read_text()


_WORKER_POINTS = r"""
import os, sys
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]; nprocs = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.parallel import init_distributed
init_distributed(coordinator_address=coord, num_processes=nprocs,
                 process_id=proc_id)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from mlsp_tpu import ops
from mlsp_tpu.parallel import make_mesh, points_sharding

ndev = len(jax.devices())
assert ndev == 4  # 2 procs x 2 local devices
# jax.devices() orders by process, so the default reshape keeps the
# points axis intra-process; TRANSPOSE the device grid so the points
# axis (and the O(N^2) distance matrix sharded over it) spans the
# PROCESS boundary: points row = one device from EACH process.
grid = np.asarray(jax.devices()).reshape(2, 2).T.ravel()
mesh = make_mesh(grid, data=2, points=2)

B, N, k = 4, 64, 8
rng = np.random.default_rng(0)
x = rng.standard_normal((B, N, 3)).astype(np.float32)
# every process holds one device of EACH data shard, so the process-
# local portion of a P("data")-sharded array is the full array
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), x, x.shape)

@jax.jit
def knn_loss(x):
    idx = ops.knn_indices(x, k)
    g = ops.edge_features(x, idx)
    return jnp.sum(g * g)

with points_sharding(mesh):
    got = float(knn_loss(xs))
want = float(jax.jit(knn_loss)(jnp.asarray(x)))
assert abs(got - want) / abs(want) < 1e-5, (got, want)
print(f"proc{proc_id} OK {got:.6f}", flush=True)
"""


@pytest.mark.slow
def test_points_axis_across_processes(tmp_path):
    """The points sharding axis works when it crosses a process
    boundary: the O(N^2) distance matrix of the kNN is partitioned over
    two processes and the result equals the single-device computation."""
    procs, outs = _run_workers(_WORKER_POINTS, tmp_path, 2, 2)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        assert f"proc{i} OK" in out, out


_WORKER_SEG = r"""
import os, sys
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]; nprocs = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.parallel import init_distributed, make_mesh
init_distributed(coordinator_address=coord, num_processes=nprocs,
                 process_id=proc_id)
from mlsp_tpu.train import train_pointsegda
from mlsp_tpu.utils.config import PointSegDAConfig

out = os.environ["MLSP_TEST_OUT"]
cfg = PointSegDAConfig(
    synthetic=True, epochs=1, batch_size=4, num_points=64,
    out_path=out, exp_name="mhseg", test_batch_size=4, scan_steps=2)
mesh = make_mesh(jax.devices(), data=len(jax.devices()), points=1)
state, results = train_pointsegda(cfg, mesh=mesh)
print(f"proc{proc_id} final {results['test']['mIoU']:.6f} "
      f"{results['test']['loss']:.6f}", flush=True)
"""


@pytest.mark.slow
def test_seg_trainer_two_process(tmp_path):
    """The PointSegDA trainer also runs unchanged on a real 2-process
    cluster with identical replicated metrics on both ranks."""
    coord = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER_SEG)
    env = _env(2)
    env["MLSP_TEST_OUT"] = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord, "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    finals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        line = [l for l in out.splitlines() if f"proc{i} final" in l]
        assert line, out
        finals.append(line[0].split("final")[1])
    assert finals[0] == finals[1], finals
    # the seg trainer suffixes the exp dir with the transfer pair
    log = tmp_path / "mhseg_adobe_faust" / "run.log"
    assert log.exists()
    assert "[rank 1]" not in log.read_text()


_WORKER_SPST = r"""
import os, sys
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]; nprocs = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.parallel import init_distributed, make_mesh
init_distributed(coordinator_address=coord, num_processes=nprocs,
                 process_id=proc_id)
from mlsp_tpu.train import train_pointda, train_spst
from mlsp_tpu.utils.config import PointDAConfig, SPSTConfig

out = os.environ["MLSP_TEST_OUT"]
mesh = make_mesh(jax.devices(), data=len(jax.devices()), points=1)
common = dict(synthetic=True, batch_size=8, num_points=64,
              test_batch_size=8, scan_steps=2, model="pointnet",
              out_path=out, seed=1)
pre, _ = train_pointda(PointDAConfig(exp_name="spst_pre", epochs=1,
                                     apply_PCM=False, **common), mesh=mesh)
_, results = train_spst(
    SPSTConfig(exp_name="spst_mh", epochs=1, rounds=1, model_file="",
               threshold=10.0, **common),
    initial_state=pre, mesh=mesh)
print(f"proc{proc_id} final {results['final']['acc']:.6f}", flush=True)
"""


@pytest.mark.slow
def test_spst_trainer_two_process(tmp_path):
    """SPST (pretrain -> selection -> fine-tune) on a real 2-process
    cluster: scanned selection and fine-tune steps run over the global
    mesh, both ranks report the identical replicated result."""
    coord = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER_SPST)
    env = _env(2)
    env["MLSP_TEST_OUT"] = str(tmp_path)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord, "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    finals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out}"
        line = [l for l in out.splitlines() if f"proc{i} final" in l]
        assert line, out
        finals.append(line[0].split("final")[1])
    assert finals[0] == finals[1], finals


_WORKER_DIE = r"""
import os, sys, time
import jax

proc_id = int(sys.argv[1]); coord = sys.argv[2]; nprocs = int(sys.argv[3])
jax.config.update("jax_platforms", "cpu")
from mlsp_tpu.parallel import init_distributed
init_distributed(coordinator_address=coord, num_processes=nprocs,
                 process_id=proc_id, heartbeat_timeout_seconds=10)
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from mlsp_tpu.parallel import make_mesh

mesh = make_mesh(jax.devices(), data=len(jax.devices()), points=1)
x = np.arange(len(jax.devices()) * 4, dtype=np.float32)
shard = x.size // nprocs
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")),
    x[proc_id * shard : (proc_id + 1) * shard], x.shape)
total = jax.jit(jnp.sum)(xs)  # cross-process reduce: cluster is live
print(f"proc{proc_id} warm {float(total)}", flush=True)

if proc_id == 1:
    os._exit(3)  # simulated crash/preemption, no goodbye to the cluster

# Survivor: keep working; the coordination-service heartbeat must turn
# the dead peer into a CLEAN ABORT here (nonzero exit), not a hang.
try:
    for i in range(120):
        time.sleep(1)
        float(jax.jit(jnp.sum)(xs + i))
    print("survivor still alive after 120s", flush=True)
    sys.exit(0)  # peer death never surfaced -> the TEST will fail
except Exception as e:
    print(f"survivor got error: {type(e).__name__}", flush=True)
    sys.exit(7)
"""


@pytest.mark.slow
def test_dead_peer_fails_fast(tmp_path):
    """Kill one rank mid-run: the survivor must surface a clean error
    within the (tightened) heartbeat window — not hang. The reference
    has no failure detection at all (SURVEY §5)."""
    procs, outs = _run_workers(_WORKER_DIE, tmp_path, 2, 1, timeout=180)
    p0, p1 = procs
    assert p1.returncode == 3, f"rank1 should have died:\n{outs[1]}"
    assert "warm" in outs[0], outs[0]
    # the survivor must NOT report a clean 120 s survival, and must exit
    # nonzero (either our handler's 7 or the runtime's own abort)
    assert "still alive" not in outs[0], (
        f"survivor hung past the heartbeat window:\n{outs[0]}")
    assert p0.returncode != 0, f"survivor exited 0:\n{outs[0]}"
