"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-step compiles on the 8-device mesh (minutes)

from mlsp_tpu.parallel import make_mesh, replicate, replicated_sharding, shard_batch


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    x = np.zeros((16, 8, 3), np.float32)
    xs = shard_batch(mesh, x)
    assert xs.sharding.num_devices == 8
    # leading axis split into 8 shards of 2
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(2, 8, 3)}


def test_dp_step_matches_single_device():
    """A sharded jitted matmul-and-reduce equals its single-device result
    (XLA inserts the cross-device psum)."""
    mesh = make_mesh()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 32)).astype(np.float32)
    w = rng.standard_normal((32, 4)).astype(np.float32)

    @jax.jit
    def grad_step(w, x):
        def loss(w):
            return jnp.mean(jnp.square(x @ w))
        return jax.grad(loss)(w)

    g_single = np.asarray(grad_step(w, x))
    xs = shard_batch(mesh, x)
    ws = jax.device_put(w, replicated_sharding(mesh))
    g_sharded = np.asarray(grad_step(ws, xs))
    np.testing.assert_allclose(g_sharded, g_single, rtol=1e-5, atol=1e-6)


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (32, 10)


def test_points_axis_sharding():
    """2D (data x points) mesh: a knn-style distance matrix accepts the
    points-axis constraint and produces identical results."""
    from mlsp_tpu.parallel.mesh import make_mesh, shard_points_constraint
    from mlsp_tpu.ops.pairwise import self_sqdist

    mesh = make_mesh(data=4, points=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64, 3)).astype(np.float32)

    @jax.jit
    def dists_sharded(x):
        d = self_sqdist(x)
        return shard_points_constraint(d, mesh)

    xs = shard_batch(mesh, x)
    got = np.asarray(dists_sharded(xs))
    want = np.asarray(self_sqdist(x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_points_constraint_lands_in_lowered_program():
    """The constraint must be present in the COMPILED program, not just
    numerically invisible: (a) a fresh trace under points_sharding
    carries sdy.sharding_constraint on the distance matrix; (b) a
    program traced BEFORE the context (stale inner-jit cache, e.g. from
    model.init) is retraced when the context is entered."""
    from mlsp_tpu.ops.knn import knn_indices
    from mlsp_tpu.parallel import make_mesh, points_sharding

    mesh = make_mesh(data=2, points=4)
    x = jnp.zeros((8, 64, 3), jnp.float32)

    def f(y):
        return knn_indices(y, 8)

    # Pollute the inner-jit cache by tracing OUTSIDE the context first.
    pre = jax.jit(f).lower(x).as_text()
    assert "sharding_constraint" not in pre

    with points_sharding(mesh):
        post = jax.jit(f).lower(x).as_text()
    assert "sharding_constraint" in post, (
        "points constraint missing from the program traced under "
        "points_sharding (stale jit cache?)"
    )


def test_points_constraint_survives_reentry_after_outside_trace():
    """Re-entry staleness (the dirty-bit path, parallel/mesh.py): after
    the caches were cleared for a mesh, a trace OUTSIDE the context
    (here: an eval-style jit) must not be reused INSIDE a later entry
    with the constraint missing — regardless of which contexts ran
    earlier in the process."""
    from mlsp_tpu.ops.knn import knn_indices
    from mlsp_tpu.parallel import make_mesh, points_sharding

    mesh = make_mesh(data=2, points=4)
    x = jnp.zeros((8, 64, 3), jnp.float32)

    def f(y):
        return knn_indices(y, 8)

    # First entry: caches cleared for `mesh`, constrained trace exists.
    with points_sharding(mesh):
        assert "sharding_constraint" in jax.jit(f).lower(x).as_text()
    # Outside: a NEW shape forces a fresh trace, which lands in the
    # shared caches unconstrained. (Re-lowering the OLD shape outside
    # reuses the constrained program — allowed, numerically identical.)
    x2 = jnp.zeros((8, 32, 3), jnp.float32)
    assert "sharding_constraint" not in jax.jit(f).lower(x2).as_text()
    # Re-entry with the SAME mesh must retrace, not reuse the stale one.
    with points_sharding(mesh):
        again = jax.jit(f).lower(x2).as_text()
    assert "sharding_constraint" in again, (
        "stale unconstrained program reused on points_sharding re-entry"
    )


def test_points_axis_full_step_numerics():
    """The REAL MLSP step traced under `points_sharding` on a 2x4
    (data x points) mesh: the O(N^2) intermediates inside kNN/density get
    the points constraint (via `ops.pairwise`), and loss + grads match
    the single-device step."""
    from mlsp_tpu.models import DGCNN
    from mlsp_tpu.parallel import make_mesh, points_sharding, replicate, shard_batch
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    mesh = make_mesh(data=2, points=4)
    B, N = 4, 32
    cfg = PointDAConfig(
        batch_size=B, num_points=N, synthetic=True, radius=0.3,
        Density_normal_viainput=True, Normal_ondef=True, Density_ondef=True,
    )
    model = DGCNN(num_classes=10, k=8)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        epochs=1, steps_per_epoch=2,
        heads=("defrec", "normal", "scan", "density"),
    )
    rng = np.random.default_rng(0)
    sx = rng.standard_normal((B, N, 3)).astype(np.float32)
    sy = rng.integers(0, 10, B).astype(np.int64)
    tx = rng.standard_normal((B, N, 3)).astype(np.float32)
    key = jax.random.key(1)

    def fn(s, a, b, c, k):
        grads, m, _ = steps._pointda_grads_inner(s, a, b, c, k, cfg)
        return grads, m["total"]

    # x64: same rationale as __graft_entry__.dryrun_multichip — in pure
    # f32 cross-shard reduction-order noise flips ties in DGCNN's
    # feature-space kNN graph, making grads discontinuous.
    with jax.enable_x64():
        with points_sharding(mesh):
            # separate jit instance: the constraint must be in THIS trace
            g8, t8 = jax.jit(fn)(
                replicate(mesh, state), *shard_batch(mesh, (sx, sy, tx)), key
            )
        g1, t1 = jax.jit(fn)(state, sx, sy, tx, key)
    t1, t8 = float(t1), float(t8)
    assert abs(t8 - t1) <= 1e-5 * max(1.0, abs(t1)), (t8, t1)
    # Criterion mirrors __graft_entry__.dryrun_multichip: the distance
    # matmul pins f32 (preferred_element_type), so resharding-induced
    # reduction-order noise can still flip kNN/radius ties on ~0.05% of
    # entries; a real sharding bug (dropped collective, per-shard batch
    # stats) moves whole leaves by O(1) — per-leaf + global relative
    # Frobenius norms catch that while tolerating tie-flip noise.
    sq_diff = sq_ref = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        d2, r2 = float(np.sum((a - b) ** 2)), float(np.sum(a**2))
        # absolute floor: pre-BN bias grads are ~1e-7 (BN cancels them),
        # so their relative norm is meaningless noise-over-noise
        assert d2**0.5 < max(0.1 * r2**0.5, 1e-4), (
            f"leaf grad diff {d2**0.5:.2e} vs norm {r2**0.5:.2e}"
        )
        sq_diff += d2
        sq_ref += r2
    ratio = (sq_diff / max(sq_ref, 1e-24)) ** 0.5
    assert ratio < 2e-2, f"global grad rel-norm diff {ratio:.2e}"


def test_train_pointsegda_under_mesh(tmp_path):
    """Seg trainer-level mesh wiring (full epoch + eval + checkpoint)."""
    from mlsp_tpu.parallel import make_mesh
    from mlsp_tpu.train import train_pointsegda
    from mlsp_tpu.utils.config import PointSegDAConfig

    mesh = make_mesh(data=4, points=2)
    cfg = PointSegDAConfig(
        synthetic=True, epochs=1, batch_size=8, test_batch_size=8,
        num_points=128, DefRec_on_trgt=True, density_radius=0.3,
        scan_steps=2, out_path=str(tmp_path), exp_name="seg_mesh",
    )
    state, results = train_pointsegda(cfg, mesh=mesh)
    assert 0.0 <= results["test"]["mIoU"] <= 1.0


def test_train_spst_under_mesh(tmp_path):
    """SPST trainer-level mesh wiring (selection + fine-tune + eval)."""
    from mlsp_tpu.parallel import make_mesh
    from mlsp_tpu.train import train_spst
    from mlsp_tpu.utils.config import SPSTConfig

    mesh = make_mesh(data=4, points=2)
    cfg = SPSTConfig(
        synthetic=True, out_path=str(tmp_path), exp_name="spst_mesh",
        batch_size=8, num_points=64, epochs=1, rounds=1, threshold=10.0,
        model="pointnet", model_file="", test_batch_size=8, scan_steps=2,
    )
    _, results = train_spst(cfg, mesh=mesh)
    assert 0.0 <= results["final"]["acc"] <= 1.0


def test_train_pointda_under_mesh(tmp_path):
    """Trainer-level mesh wiring: replicate params, shard every batch,
    run a full epoch + eval + checkpoint under the mesh."""
    from mlsp_tpu.parallel import make_mesh
    from mlsp_tpu.train import train_pointda
    from mlsp_tpu.utils.config import PointDAConfig

    mesh = make_mesh(data=4, points=2)
    cfg = PointDAConfig(
        model="pointnet", synthetic=True, epochs=1, batch_size=8,
        num_points=64, test_batch_size=8, apply_PCM=False, scan_steps=4,
        out_path=str(tmp_path), exp_name="mesh_run",
    )
    state, results = train_pointda(cfg, mesh=mesh)
    assert 0.0 <= results["test"]["acc"] <= 1.0
    assert results["best"]["epoch"] >= 0


def test_scan_step_sharded_matches_serial_shapes():
    """The scanned multi-step train program runs under a dp mesh."""
    from mlsp_tpu.models import PointNet
    from mlsp_tpu.parallel import make_mesh, replicate, replicated_sharding, shard_batch
    from mlsp_tpu.train import create_train_state, steps
    from mlsp_tpu.utils.config import PointDAConfig

    mesh = make_mesh()
    B, N, S = 8, 32, 3
    cfg = PointDAConfig(batch_size=B, num_points=N, synthetic=True,
                        apply_PCM=False, model="pointnet", radius=0.3)
    model = PointNet(num_classes=10)
    state = create_train_state(
        model, jax.random.key(0), jnp.zeros((B, N, 3), jnp.float32),
        epochs=1, steps_per_epoch=S, heads=("defrec",),
    )
    rng = np.random.default_rng(1)
    sxs = rng.standard_normal((S, B, N, 3)).astype(np.float32)
    sys_ = rng.integers(0, 10, (S, B)).astype(np.int64)
    txs = rng.standard_normal((S, B, N, 3)).astype(np.float32)

    state = replicate(mesh, state)
    # batch axis is dim 1 here; shard manually over data
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(None, "data"))
    sxs, txs = jax.device_put(sxs, sh), jax.device_put(txs, sh)
    sys_ = jax.device_put(sys_, sh)
    key = jax.device_put(jax.random.key(2), replicated_sharding(mesh))

    state, ms = steps.pointda_train_scan(state, sxs, sys_, txs, key, cfg)
    totals = np.asarray(ms["total"])
    assert totals.shape == (S,) and np.isfinite(totals).all()


def test_knn_auto_backend_respects_points_mesh(monkeypatch):
    """Under an active points-sharding mesh, backend="auto" must resolve
    to the XLA path (which routes through `pairwise_sqdist`, the one
    producer carrying the P("data", "points") constraint) even on TPU,
    where "auto" otherwise picks the Pallas kernel that keeps distances
    in VMEM — unconstrained."""
    from mlsp_tpu.ops.knn import _resolve_backend
    from mlsp_tpu.parallel import make_mesh, points_sharding

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _resolve_backend("auto") == "pallas"
    with points_sharding(make_mesh(data=2, points=4)):
        assert _resolve_backend("auto") == "xla"
    assert _resolve_backend("auto") == "pallas"
    # explicit backends pass through untouched
    with points_sharding(make_mesh(data=2, points=4)):
        assert _resolve_backend("pallas") == "pallas"


def test_replicate_for_mesh_validates_batch():
    from mlsp_tpu.parallel import make_mesh, replicate_for_mesh

    mesh = make_mesh()
    state = {"w": jnp.ones((4, 4))}
    out = replicate_for_mesh(mesh, state, 16)
    assert out["w"].sharding.is_fully_replicated
    with pytest.raises(ValueError, match="not divisible"):
        replicate_for_mesh(mesh, state, 9)
    assert replicate_for_mesh(None, state, 9) is state
