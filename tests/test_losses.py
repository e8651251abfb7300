"""Loss golden-value and semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mlsp_tpu import losses as L
from mlsp_tpu import ops

from oracles import reconstruction_loss_np


def softmax_np(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


class TestCrossEntropy:
    def test_golden(self):
        logits = np.array([[2.0, 1.0, 0.0], [0.0, 0.0, 0.0]], np.float32)
        labels = np.array([0, 2])
        p = softmax_np(logits)
        want = -np.mean(np.log(p[[0, 1], labels]))
        got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_mixup(self):
        logits = np.random.default_rng(0).standard_normal((4, 10)).astype(np.float32)
        ya = np.array([1, 2, 3, 4])
        yb = np.array([5, 6, 7, 8])
        lam, w = 0.3, 0.5
        got = float(L.mixup_cross_entropy(logits, ya, yb, lam, w))
        ca = float(L.cross_entropy(logits, ya))
        cb = float(L.cross_entropy(logits, yb))
        np.testing.assert_allclose(got, (lam * ca + (1 - lam) * cb) * (1 - w), rtol=1e-6)


class TestDefRec:
    def test_scaler_and_weight(self, rng):
        pred = rng.standard_normal((2, 32, 3)).astype(np.float32)
        gold = rng.standard_normal((2, 32, 3)).astype(np.float32)
        mask = np.ones((2, 32), np.float32)
        base = reconstruction_loss_np(pred, gold, mask)
        got = float(L.defrec_loss(pred, gold, mask, defrec_weight=0.5))
        np.testing.assert_allclose(got, 0.5 * base * 20.0, rtol=1e-4)


class TestNormal:
    def test_perfect_alignment(self, rng):
        n = rng.standard_normal((2, 16, 3)).astype(np.float32)
        got = float(L.normal_loss(n, 3.0 * n, weight=0.5))
        np.testing.assert_allclose(got, -0.5, atol=1e-5)

    def test_orthogonal(self):
        a = np.tile(np.array([1.0, 0, 0], np.float32), (1, 8, 1))
        b = np.tile(np.array([0, 1.0, 0], np.float32), (1, 8, 1))
        assert abs(float(L.normal_loss(a, b, 1.0))) < 1e-6

    def test_sign_invariance(self, rng):
        a = rng.standard_normal((2, 16, 3)).astype(np.float32)
        b = rng.standard_normal((2, 16, 3)).astype(np.float32)
        l1 = float(L.normal_loss(a, b, 1.0))
        l2 = float(L.normal_loss(a, -b, 1.0))
        np.testing.assert_allclose(l1, l2, rtol=1e-5)

    def test_masked_weighting(self, rng):
        a = rng.standard_normal((2, 16, 3)).astype(np.float32)
        mask = (rng.random((2, 16)) < 0.5).astype(np.float32)
        w = L.region_weights(mask, defpart=False)
        np.testing.assert_allclose(np.asarray(w), mask * 26 + 1)
        got = float(L.masked_normal_loss(a, a, w, weight=1.0))
        np.testing.assert_allclose(got, -1.0, atol=1e-5)


class TestDensity:
    def test_unmasked_golden(self, rng):
        M, C = 64, 16
        p_vec = softmax_np(rng.standard_normal((M, C))).astype(np.float32)
        t_vec = softmax_np(rng.standard_normal((M, C))).astype(np.float32)
        p_val = rng.random(M).astype(np.float32) * 30
        t_val = rng.random(M).astype(np.float32) * 30
        kl, mae = L.density_loss(p_vec, p_val, t_vec, t_val, density_weight=0.05)
        want_kl = -0.05 * np.mean((t_vec * np.log(p_vec + 1e-10)).sum(-1)) * 1.0
        want_mae = 0.05 * np.mean(np.abs(p_val - t_val)) * 0.05
        np.testing.assert_allclose(float(kl), want_kl, rtol=1e-5)
        np.testing.assert_allclose(float(mae), want_mae, rtol=1e-5)

    def test_masked(self, rng):
        M, C = 32, 16
        p_vec = softmax_np(rng.standard_normal((M, C))).astype(np.float32)
        t_vec = p_vec.copy()
        p_val = rng.random(M).astype(np.float32)
        mask = (rng.random(M) < 0.5).astype(np.float32)
        mask[0] = 1.0
        kl, mae = L.density_loss(p_vec, p_val, t_vec, p_val, 0.05, mask=mask)
        assert float(mae) == 0.0
        ll = (t_vec * np.log(p_vec + 1e-10)).sum(-1)
        want = -0.05 * (ll * mask).sum() / mask.sum()
        np.testing.assert_allclose(float(kl), want, rtol=1e-5)


class TestTransported:
    def test_identity_transport(self, rng):
        """When pred == gold, index maps are identity and transported losses
        reduce to their direct counterparts."""
        B, N = 2, 32
        pts = rng.standard_normal((B, N, 3)).astype(np.float32)
        mask = np.ones((B, N), np.float32)
        i1, i2 = ops.nearest_index_pair(pts, pts, mask)
        np.testing.assert_array_equal(np.asarray(i1)[0], np.arange(N))

        normals = rng.standard_normal((B, N, 3)).astype(np.float32)
        w = L.region_weights(mask, defpart=False)
        got = float(L.transported_normal_loss(normals, normals, w, (i1, i2), 0.5))
        np.testing.assert_allclose(got, 0.5 * -2.0, atol=1e-5)

    def test_transported_density_symmetry(self, rng):
        B, N, C = 2, 16, 8
        p_vec = softmax_np(rng.standard_normal((B, N, C))).astype(np.float32)
        p_val = rng.random((B, N)).astype(np.float32)
        mask = np.ones((B, N), np.float32)
        idx = jnp.tile(jnp.arange(N)[None], (B, 1))
        kl, mae = L.transported_density_loss(
            p_vec, p_val, p_vec, p_val, mask, (idx, idx), 0.05
        )
        assert float(mae) == 0.0
        # Both directions identical when pred == target and transport = id.
        kl_one, _ = L.density_loss(
            p_vec.reshape(-1, C), p_val.reshape(-1),
            p_vec.reshape(-1, C), p_val.reshape(-1), 0.05,
            mask=mask.reshape(-1),
        )
        np.testing.assert_allclose(float(kl), 2 * float(kl_one), rtol=1e-5)
