"""Native C++ host-library tests: builds with g++, matches the device
kernels and numpy oracles."""

import numpy as np
import pytest

from mlsp_tpu import native

from oracles import fps_np, radius_count_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable (no g++?)"
)


def test_scale_to_unit_cube(rng):
    pts = (rng.standard_normal((200, 3)) * 5 + 2).astype(np.float32)
    out = native.scale_to_unit_cube(pts)
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1).max(), 1.0, atol=1e-5)


def test_fps_matches_oracle(rng):
    pts = rng.standard_normal((300, 3)).astype(np.float32)
    got = native.fps(pts, 32, start=7)
    want = fps_np(pts, 32, 7)
    np.testing.assert_array_equal(got, want)


def test_radius_count_matches_oracle(rng):
    pts = rng.standard_normal((256, 3)).astype(np.float32) * 0.5
    got = native.radius_count(pts, 0.3)
    want = radius_count_np(pts, 0.3)
    np.testing.assert_allclose(got, want)


def test_normals_plane(rng):
    pts = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    pts[:, 2] = 0.0
    n = native.estimate_normals(pts, 16)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-3)
    # unit length
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-4)


def test_normals_match_device_kernel(rng):
    import jax.numpy as jnp
    from mlsp_tpu import ops

    pts = rng.standard_normal((128, 3)).astype(np.float32)
    nc = native.estimate_normals(pts, 12)
    nd = np.asarray(ops.estimate_normals(jnp.asarray(pts[None]), 12))[0]
    cos = np.abs((nc * nd).sum(-1))
    assert (cos > 0.99).mean() > 0.95  # allow a few tie-different neighbourhoods
