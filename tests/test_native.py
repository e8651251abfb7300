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


def test_radius_count_cap_boundary(rng):
    # Dense cluster: the K=100 cap binds; point 0 at the edge misses the
    # top-100 cut for central queries (cf. test_ops.TestDensity).
    pts = (0.02 * rng.standard_normal((240, 3)) + 1.0).astype(np.float32)
    pts[0] = pts[1:].mean(0) + np.float32([0.08, 0.0, 0.0])
    got = native.radius_count(pts, 0.5, cap=100)
    want = radius_count_np(pts, 0.5, cap=100)
    assert want.max() == 100.0 and (want == 99.0).any()
    np.testing.assert_array_equal(got, want)


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


class TestNativeIngest:
    """Threaded npy data-loader (mlsp_host.cpp::mlsp_load_npy_clouds)."""

    def _write_tree(self, tmp_path, rng):
        files, sizes = [], [500, 1500, 64, 2049]
        for i, p in enumerate(sizes):
            pc = rng.standard_normal((p, 3)) * 3 + 1
            if i == 1:  # f8 payload with a label column (seg-style [P,4])
                pc = np.concatenate([pc, np.ones((p, 1))], 1)
            else:
                pc = pc.astype(np.float32)
            f = str(tmp_path / f"c{i}.npy")
            np.save(f, pc)
            files.append(f)
        return files, sizes

    def test_npy_sizes(self, tmp_path, rng):
        files, sizes = self._write_tree(tmp_path, rng)
        assert list(native.npy_sizes(files)) == sizes

    def test_matches_numpy_path(self, tmp_path, rng):
        """Full ingest (unit-cube + masked alignment rotation + pad +
        device FPS) agrees with the pure-numpy pipeline."""
        from mlsp_tpu.data.pipeline import standardize_files

        files, _ = self._write_tree(tmp_path, rng)
        mask = np.array([1, 0, 1, 1], bool)
        kw = dict(rotate_axis="x", rotate_angle=-np.pi / 2, rotate_mask=mask)
        a = standardize_files(files, 128, native_ingest=True, **kw)
        b = standardize_files(files, 128, native_ingest=False, **kw)
        np.testing.assert_allclose(a, b, atol=2e-6)

    def test_bad_file_reports_path(self, tmp_path):
        bad = tmp_path / "bad.npy"
        bad.write_bytes(b"not an npy file")
        with pytest.raises(ValueError, match="bad.npy"):
            native.npy_sizes([str(bad)])

    def test_load_rejects_oversized(self, tmp_path, rng):
        """Bucketing contract: rows > pad_points is a caller bug."""
        f = str(tmp_path / "big.npy")
        np.save(f, rng.standard_normal((100, 3)).astype(np.float32))
        with pytest.raises(ValueError, match="big.npy"):
            native.load_npy_clouds([f], 64)
