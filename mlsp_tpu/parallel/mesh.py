"""Device mesh + sharding helpers — the communication layer.

The reference's only parallelism is single-process `nn.DataParallel`
(`PointDA/trainer.py:251-252`); here parallelism is expressed the TPU
way: a `jax.sharding.Mesh`, batches sharded over the `data` axis,
parameters replicated, and XLA inserting all-reduces over ICI for the
gradient sum (multi-host: same program over DCN after
`jax.distributed.initialize`).

BatchNorm note: under jit with a sharded batch, `jnp.mean` over the
batch axis is a *global* mean — XLA emits the cross-replica collective
automatically, so batch statistics are synchronized across shards
(better than the reference's per-GPU stats).

A second optional `points` axis ("sequence parallelism" for point
clouds) shards the O(N^2) kNN/Chamfer intermediates; see
`shard_points_constraint`.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     heartbeat_timeout_seconds: int = 30, **kw) -> None:
    """Fail-fast multi-host bring-up.

    `jax.distributed.initialize` with the coordination-service heartbeat
    tightened from jax's 100 s default: when a peer process dies
    mid-run, the survivors ABORT with a clean error within
    ~`heartbeat_timeout_seconds` instead of hanging in the next
    collective (SURVEY §5: the reference has no failure detection at
    all; exercised by `tests/test_multihost.py::test_dead_peer_fails_fast`).
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address, num_processes=num_processes,
        process_id=process_id,
        heartbeat_timeout_seconds=heartbeat_timeout_seconds, **kw)


def make_mesh(devices=None, data: int | None = None, points: int = 1) -> Mesh:
    """Build a (data[, points]) mesh over the given / all devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // points
    assert data * points == n, f"{data}x{points} != {n} devices"
    arr = np.asarray(devices).reshape(data, points)
    return Mesh(arr, ("data", "points"))


def fetch_global(x) -> np.ndarray:
    """Materialise a (possibly multi-process-sharded) array on the host.

    Single process: a plain `np.asarray`. Multi-host: `np.asarray` on a
    global array whose shards live on other processes raises, so the
    value is all-gathered across processes first
    (`multihost_utils.process_allgather`) — every rank gets the full
    array (trainer evals/selection need it everywhere to keep ranks in
    lockstep)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    if isinstance(x, jax.Array):
        if x.is_fully_replicated:
            # every process holds the whole value — read the local copy
            # (process_allgather would CONCATENATE per-process copies)
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis sharded over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device-put every leaf with its leading axis split over `data`."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    """Device-put every leaf fully replicated."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate_for_mesh(mesh: Mesh | None, state, batch_size: int):
    """Trainer entry helper: validate the batch splits over the `data`
    axis, then replicate the train state. Identity when mesh is None."""
    if mesh is None:
        return state
    n_data = mesh.shape["data"]
    if batch_size % n_data:
        raise ValueError(
            f"batch_size {batch_size} not divisible by the mesh "
            f"data axis ({n_data} devices)"
        )
    return replicate(mesh, state)


def shard_points_constraint(x, mesh: Mesh | None):
    """Annotate a [B, N, ...] intermediate to also split N over `points`.

    Used for the O(N^2) distance tensors when a points axis > 1 is
    configured; a no-op on a pure-dp mesh.
    """
    if mesh is None or mesh.shape.get("points", 1) == 1:
        return x
    spec = P("data", "points", *([None] * (x.ndim - 2)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


# ---------------------------------------------------------------------------
# Points-axis ("sequence parallel" for point clouds) activation context.
#
# The O(N^2) distance matrices are produced in ONE place
# (`ops.pairwise.pairwise_sqdist` — kNN graphs, Chamfer, radius density,
# ball query all go through it), so the constraint is applied there.
# Because sharding constraints must be present at TRACE time, activate
# the context around the first call of each jitted step; the trainers do
# this around their whole epoch loop.
# ---------------------------------------------------------------------------

_ACTIVE_POINTS_MESH: Mesh | None = None
_CLEARED_FOR: Mesh | None = None  # last mesh the jit caches were cleared for
# True whenever an O(N^2) producer was traced with NO active mesh since
# the last cache clear — such a program could be cached and silently
# reused (constraint missing) after the context is (re-)entered.
_UNCONSTRAINED_TRACED: bool = True


def note_unconstrained_trace() -> None:
    """Called by `ops.pairwise.pairwise_sqdist` when traced outside any
    points-sharding context; makes the next `points_sharding.__enter__`
    clear the jit caches so no stale unconstrained program survives."""
    global _UNCONSTRAINED_TRACED
    _UNCONSTRAINED_TRACED = True


class points_sharding:
    """Context manager: ops traced inside constrain their [B, N, N]
    distance intermediates to P("data", "points") over `mesh`.

    No-op when `mesh` is None or has a trivial points axis.

    The active mesh is consulted at TRACE time, but jit caches (outer
    steps AND inner jits like `knn_indices`) are keyed on abstract
    values only — a program traced before the context was entered (e.g.
    during `model.init`) would be silently reused with the constraint
    MISSING. Entering therefore clears the jit caches whenever they
    could hold such a program: on a mesh change, or after any
    unconstrained trace of the O(N^2) producer
    (`note_unconstrained_trace`). Re-entering with the same mesh when
    everything since the last clear was traced under the context (the
    per-step pattern in the trainers, whose eval loops also run under
    the context) costs nothing. The reverse direction is deliberately
    not cleared: a constrained program reused outside the context is
    numerically identical — it merely keeps its outputs laid out over
    the mesh.
    """

    def __init__(self, mesh: Mesh | None):
        active = mesh is not None and mesh.shape.get("points", 1) > 1
        self.mesh = mesh if active else None

    def __enter__(self):
        global _ACTIVE_POINTS_MESH, _CLEARED_FOR, _UNCONSTRAINED_TRACED
        self._prev = _ACTIVE_POINTS_MESH
        if self.mesh is not None and (
            self.mesh != _CLEARED_FOR or _UNCONSTRAINED_TRACED
        ):
            jax.clear_caches()
            _CLEARED_FOR = self.mesh
            _UNCONSTRAINED_TRACED = False
        _ACTIVE_POINTS_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _ACTIVE_POINTS_MESH
        _ACTIVE_POINTS_MESH = self._prev
        return False


def active_points_mesh() -> Mesh | None:
    return _ACTIVE_POINTS_MESH


def shard_scan_batch(mesh: Mesh, tree):
    """Device-put [S, B, ...] scan-staged leaves with B split over `data`."""
    s = NamedSharding(mesh, P(None, "data"))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
