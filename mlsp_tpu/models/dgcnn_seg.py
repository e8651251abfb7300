"""Segmentation DGCNN for PointSegDA (human-body part segmentation).

Port of `DGCNN_DefRec` (`PointSegDA/Models.py:146-242`): an input
transform net (conv+leakyrelu, no BN), three *linear* double-EdgeConv
blocks (the reference's `shared_layers` applies no activations or norms
— reproduced faithfully), a 1024 global feature, and heads:
segmentation, deformation reconstruction, normal, density.

Head names: "seg", "defrec", "normal", "density".
"""

from __future__ import annotations

import typing as t

import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import DenseBN, DensityHead, PointMLPHead, act_fn
from mlsp_tpu.ops.knn import edge_features, knn_gather, knn_indices


class LinearEdgeBlock(nn.Module):
    """Linear (double-)EdgeConv + max, fully decomposed.

    The reference `shared_layers` applies 1-2 *linear* 1x1 convs to edge
    features then maxes over k (`PointSegDA/Models.py:159-184` — no
    activations/norms). For linear maps the edge value is
    `u_j - u_i + w_i`, and max_j distributes: the block reduces to a
    channelwise max over gathered `u` plus per-point terms. No
    [B, N, k, C] tensor is ever built — a k-fold FLOP cut and a large
    memory cut, bit-equivalent (up to reparametrised biases) to the
    reference layers.
    """

    widths: tuple[int, ...]
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, idx, train: bool):
        u = x
        for i, width in enumerate(self.widths):
            u = nn.Dense(width, use_bias=False, dtype=self.dtype,
                         name=f"w_diff{i}")(u)
        w = x
        for i, width in enumerate(self.widths):
            w = nn.Dense(width, use_bias=True, dtype=self.dtype,
                         name=f"w_center{i}")(w)
        u_max = jnp.max(knn_gather(u, idx), axis=-2)  # [B, N, C]
        return u_max - u + w


class SegTransformNet(nn.Module):
    """PointSegDA transform net: conv(+leakyrelu, no BN) stack -> KxK."""

    out: int = 3

    @nn.compact
    def __call__(self, x, train: bool):
        lr = act_fn("leakyrelu")
        x = lr(nn.Dense(64, use_bias=False)(x))
        x = lr(nn.Dense(128, use_bias=False)(x))
        x = jnp.max(x, axis=-2)  # over K
        x = lr(nn.Dense(1024, use_bias=False)(x))
        x = jnp.max(x, axis=-2)  # over N
        x = lr(nn.Dense(512)(x))
        x = lr(nn.Dense(256)(x))
        x = nn.Dense(self.out * self.out)(x)
        eye = jnp.eye(self.out, dtype=x.dtype).reshape(-1)
        return (x + eye).reshape(x.shape[0], self.out, self.out)


class SegPointHead(nn.Module):
    """Per-point head with biases (`segmentation`/`DeformationReconstruction`,
    `PointSegDA/Models.py:245-296`)."""

    out: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool):
        x = DenseBN(256, "relu", use_bias=True)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(256, "relu", use_bias=True)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(128, "relu", use_bias=True)(x, train)
        return nn.Dense(self.out, use_bias=True)(x)


class DGCNNSeg(nn.Module):
    num_classes: int = 8
    k: int = 20
    dropout: float = 0.5
    density_num_cls: int = 16
    pergroup: float = 5.0
    knn_backend: str = "auto"
    dtype: t.Any = None

    def _edge(self, x):
        idx = knn_indices(x, self.k, backend=self.knn_backend)
        return edge_features(x, idx)

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ("seg",)):
        B, N, _ = x.shape

        T = SegTransformNet(out=3)(self._edge(x), train)
        x = jnp.einsum("bnc,bdc->bnd", x, T)

        # shared_layers: linear double-EdgeConv blocks, no act/BN
        # (PointSegDA/Models.py:159-191), in decomposed max-distributed form.
        dt = self.dtype

        def knn_idx(feats):
            return knn_indices(feats, self.k, backend=self.knn_backend)

        if dt is not None:
            x = x.astype(dt)
        x1 = LinearEdgeBlock((64, 64), dtype=dt)(x, knn_idx(x), train)
        x2 = LinearEdgeBlock((64, 64), dtype=dt)(x1, knn_idx(x1), train)
        x3 = LinearEdgeBlock((64,), dtype=dt)(x2, knn_idx(x2), train)
        x123 = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 192]
        x4 = nn.Dense(1024, dtype=dt)(x123)
        x5 = jnp.max(x4, axis=1).astype(jnp.float32)  # [B, 1024]

        # Implicit concat [x123 | broadcast(x5)] ([B, N, 1216]); each
        # head's first Dense runs in split form (layers.SplitDense) —
        # the global half multiplies its kernel once per cloud.
        pp = (x123, x5)

        logits = {"feat": x5}
        if "seg" in heads:
            logits["seg"] = SegPointHead(self.num_classes, self.dropout, name="seg")(pp, train)
        if "defrec" in heads:
            logits["defrec"] = SegPointHead(3, self.dropout, name="DefRec")(pp, train)
        if "normal" in heads:
            logits["normal"] = PointMLPHead(3, self.dropout, name="NormPred")(pp, train)
        if "density" in heads:
            p_vec, dens = DensityHead(
                self.density_num_cls, self.pergroup, self.dropout, "dgcnn",
                name="DensityCls",
            )(pp, train)
            logits["density"] = p_vec
            logits["density_mse"] = dens
        return logits
