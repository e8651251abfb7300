"""Transform tests: distribution/invariant checks for the PRNG-keyed ports."""

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu import transforms as T
from mlsp_tpu.transforms import deform


def clouds(rng, b=4, n=256):
    x = rng.standard_normal((b, n, 3)).astype(np.float32)
    return np.asarray(T.scale_to_unit_cube(x))


class TestAugment:
    def test_unit_cube(self, rng):
        x = clouds(rng)
        norms = np.linalg.norm(x, axis=-1).max(-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)
        np.testing.assert_allclose(x.mean(-2), 0.0, atol=1e-5)

    def test_rotate_shape_x_quarter(self, rng):
        x = clouds(rng, b=1)
        r = np.asarray(T.rotate_shape(x, "x", -np.pi / 2))
        # x @ Rx(-pi/2) with Rx = [[1,0,0],[0,c,-s],[0,s,c]]: y' = -z, z' = y.
        np.testing.assert_allclose(r[..., 0], x[..., 0], atol=1e-5)
        np.testing.assert_allclose(r[..., 1], -x[..., 2], atol=1e-5)
        np.testing.assert_allclose(r[..., 2], x[..., 1], atol=1e-5)

    def test_random_rotation_preserves_norms(self, rng):
        x = clouds(rng)
        key = jax.random.key(0)
        for fn in (
            lambda: T.random_rotate_one_axis(key, x, "z"),
            lambda: T.random_rotate_3d(key, x),
        ):
            r = np.asarray(fn())
            np.testing.assert_allclose(
                np.linalg.norm(r, axis=-1), np.linalg.norm(x, axis=-1), atol=1e-4
            )

    def test_rotate_z_keeps_z(self, rng):
        x = clouds(rng)
        r = np.asarray(T.random_rotate_one_axis(jax.random.key(1), x, "z"))
        np.testing.assert_allclose(r[..., 2], x[..., 2], atol=1e-5)

    def test_jitter_bounds(self, rng):
        x = clouds(rng)
        j = np.asarray(T.jitter(jax.random.key(2), x, sigma=0.01, clip=0.02))
        assert np.abs(j - x).max() <= 0.02 + 1e-6
        assert np.abs(j - x).max() > 0.0

    def test_translate_ranges(self, rng):
        x = np.ones((2, 8, 3), np.float32)
        t = np.asarray(T.translate(jax.random.key(3), x))
        assert (t > 2.0 / 3.0 - 0.2 - 1e-5).all() and (t < 1.5 + 0.2 + 1e-5).all()


class TestDeform:
    def test_region_means_layout(self):
        lk = np.asarray(deform.region_means(3))
        assert lk.shape == (27, 3)
        # id = ix*9 + iy*3 + iz, coordinate -1 + (2/3)*(i+0.5)
        np.testing.assert_allclose(lk[0], [-2 / 3, -2 / 3, -2 / 3], atol=1e-6)
        np.testing.assert_allclose(lk[26], [2 / 3, 2 / 3, 2 / 3], atol=1e-6)
        np.testing.assert_allclose(lk[9 + 3 + 1], [0, 0, 0], atol=1e-6)

    def test_assign_matches_means(self, rng):
        lk = np.asarray(deform.region_means(3))
        # The center of each region must be assigned to that region.
        rid = np.asarray(deform.assign_regions(lk[None], 3))[0]
        np.testing.assert_array_equal(rid, np.arange(27))

    def test_deform_batch(self, rng):
        x = clouds(rng, b=4, n=512)
        out, mask = T.deform_batch(jax.random.key(0), x)
        out, mask = np.asarray(out), np.asarray(mask)
        assert mask.shape == (4, 512)
        for b in range(4):
            sel = mask[b] > 0
            # A deformed region exists and has >= MIN_PTS points.
            assert sel.sum() >= deform.MIN_PTS
            # Untouched points identical.
            np.testing.assert_array_equal(out[b][~sel], x[b][~sel])
            # Deformed points collapse near one voxel center.
            rid = np.asarray(deform.assign_regions(x[b : b + 1]))[0]
            regions = np.unique(rid[sel])
            assert len(regions) == 1
            center = np.asarray(deform.region_means(3))[regions[0]]
            d = np.linalg.norm(out[b][sel] - center, axis=-1)
            assert d.max() < 0.3  # ~sqrt(0.001) noise scale

    def test_collapse_to_point(self, rng):
        x = clouds(rng, b=2, n=256)
        out, mask = deform.collapse_to_point_batch(jax.random.key(1), x)
        out, mask = np.asarray(out), np.asarray(mask)
        for b in range(2):
            sel = mask[b] > 0
            assert sel.sum() >= deform.RADIUS_MIN_POINTS
            np.testing.assert_array_equal(out[b][~sel], x[b][~sel])


class TestScan:
    def test_scan_batch(self, rng):
        x = clouds(rng, b=2, n=512)
        scan, mask = T.scan_batch(jax.random.key(0), x)
        scan, mask = np.asarray(scan), np.asarray(mask)
        for b in range(2):
            kept = mask[b] == 0
            assert 0 < kept.sum() < 512  # some occlusion happened
            np.testing.assert_array_equal(scan[b][kept], x[b][kept])
            np.testing.assert_array_equal(scan[b][~kept], 0.0)

    def test_visible_fraction_reasonable(self, rng):
        # A dense sphere seen from one side keeps roughly half its points
        # at typical pixel sizes; just sanity-check the fraction range.
        x = clouds(rng, b=4, n=1024)
        _, mask = T.scan_batch(jax.random.key(5), x)
        frac_kept = 1.0 - np.asarray(mask).mean()
        assert 0.05 < frac_kept < 0.95
