"""On-device surface-normal estimation (kNN-PCA).

TPU-native replacement for the reference's per-cloud C++ PCL
`NormalEstimation` round-trips (`PointDA/trainer.py:158-188`, used per
training batch at `:414-421,477-484,524-531` — a CPU bottleneck the
reference pays every step). Here the whole computation — kNN, covariance,
smallest eigenvector — is vectorised over B*N points and runs inside the
jitted train step.

The smallest eigenvector of the 3x3 neighbourhood covariance is computed
in closed form (trigonometric eigenvalues + cross-product null space), all
VPU-friendly elementwise math — no LAPACK-style custom calls.

Parity notes vs PCL:
  * PCL's kd-tree kSearch includes the query point itself; so does our kNN
    (self-distance 0 ranks first).
  * PCL flips normals toward the viewpoint (default origin); the MLSP
    losses are sign-invariant (|cos|), but we match the flip anyway.
  * PCL emits NaN for degenerate neighbourhoods; we regularise and always
    return a unit vector (strictly better behaviour, loss-compatible).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from mlsp_tpu.ops.knn import knn_indices, knn_gather

_EPS = 1e-12


def _smallest_eigvec_3x3(A: jax.Array) -> jax.Array:
    """Unit eigenvector for the smallest eigenvalue of symmetric A [..., 3, 3]."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]

    # Trigonometric formula for eigenvalues of a symmetric 3x3 matrix.
    p1 = a01**2 + a02**2 + a12**2
    q = (a00 + a11 + a22) / 3.0
    p2 = (a00 - q) ** 2 + (a11 - q) ** 2 + (a22 - q) ** 2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, _EPS) / 6.0)

    b00, b11, b22 = (a00 - q) / p, (a11 - q) / p, (a22 - q) / p
    b01, b02, b12 = a01 / p, a02 / p, a12 / p
    detB = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Smallest eigenvalue: q + 2p cos(phi + 2*pi/3).
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Null space of (A - lam I) via cross products of its rows; pick the
    # most linearly-independent pair for robustness.
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    r0 = jnp.stack([m00, a01, a02], axis=-1)
    r1 = jnp.stack([a01, m11, a12], axis=-1)
    r2 = jnp.stack([a02, a12, m22], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1, keepdims=True)
    n02 = jnp.sum(c02 * c02, axis=-1, keepdims=True)
    n12 = jnp.sum(c12 * c12, axis=-1, keepdims=True)
    v = jnp.where(n01 >= n02, c01, c02)
    nbest = jnp.maximum(n01, n02)
    v = jnp.where(nbest >= n12, v, c12)
    nbest = jnp.maximum(nbest, n12)
    # Degenerate (isotropic or rank-deficient beyond repair): fall back to z.
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    degenerate = (p2[..., None] < 1e-10) | (nbest < _EPS)
    v = jnp.where(degenerate, fallback, v)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True).clip(_EPS)


@functools.partial(
    jax.jit, static_argnames=("k", "orient_to_origin", "backend")
)
def estimate_normals(
    xyz: jax.Array,
    k: int = 20,
    orient_to_origin: bool = True,
    backend: str = "auto",
) -> jax.Array:
    """Per-point unit normals from kNN-PCA.

    Args:
      xyz: [B, N, 3] points.
      k: neighbourhood size (reference `--near`, default 20; self included).
      orient_to_origin: flip normals toward the origin viewpoint like PCL's
        flipNormalTowardsViewpoint(0, 0, 0).
      backend: "auto" (fused gather-free Pallas moments kernel on TPU),
        "pallas", or "xla" (kNN + gather + centered covariance).

    Returns:
      [B, N, 3] unit normals.
    """
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend == "pallas" and xyz.ndim == 3:
        from mlsp_tpu.ops.pallas.normals_pallas import knn_moments_pallas

        # Gather-free: the selection mask turns neighbourhood sums into
        # MXU matmuls; covariance by E[xx^T] - mu mu^T (clouds are
        # unit-cube so the f32 cancellation is benign).
        s1, s2 = knn_moments_pallas(xyz, k)
        mu = s1 / float(k)
        cov = s2.reshape(*s2.shape[:-1], 3, 3) / float(k) - (
            mu[..., :, None] * mu[..., None, :]
        )
    else:
        idx = knn_indices(xyz, k, backend=backend)  # [B, N, k]
        neigh = knn_gather(xyz, idx)  # [B, N, k, 3]
        centered = neigh - jnp.mean(neigh, axis=-2, keepdims=True)
        cov = jnp.einsum(
            "...ki,...kj->...ij", centered, centered,
            preferred_element_type=jnp.float32,
        ) / float(k)
    n = _smallest_eigvec_3x3(cov)
    if orient_to_origin:
        flip = jnp.sum(n * xyz, axis=-1, keepdims=True) > 0.0
        n = jnp.where(flip, -n, n)
    return n
