"""Segmentation DGCNN for PointSegDA (human-body part segmentation).

Port of `DGCNN_DefRec` (`PointSegDA/Models.py:146-242`): an input
transform net (conv+leakyrelu, no BN), three *linear* double-EdgeConv
blocks (the reference's `shared_layers` applies no activations or norms
— reproduced faithfully), a 1024 global feature, and heads:
segmentation, deformation reconstruction, normal, density.

Head names: "seg", "defrec", "normal", "density".
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import DenseBN, DensityHead, PointMLPHead, act_fn
from mlsp_tpu.ops.knn import edge_features, knn_indices


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

    def _edge(self, x):
        idx = knn_indices(x, self.k, backend=self.knn_backend)
        return edge_features(x, idx)

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ("seg",)):
        B, N, _ = x.shape

        T = SegTransformNet(out=3)(self._edge(x), train)
        x = jnp.einsum("bnc,bdc->bnd", x, T)

        # shared_layers: linear double-EdgeConv blocks, no act/BN
        # (PointSegDA/Models.py:159-191).
        h = nn.Dense(64)(self._edge(x))
        h = nn.Dense(64)(h)
        x1 = jnp.max(h, axis=-2)
        h = nn.Dense(64)(self._edge(x1))
        h = nn.Dense(64)(h)
        x2 = jnp.max(h, axis=-2)
        h = nn.Dense(64)(self._edge(x2))
        x3 = jnp.max(h, axis=-2)
        x123 = jnp.concatenate([x1, x2, x3], axis=-1)  # [B, N, 192]
        x4 = nn.Dense(1024)(x123)
        x5 = jnp.max(x4, axis=1)  # [B, 1024]

        pp = jnp.concatenate(
            [x123, jnp.broadcast_to(x5[:, None, :], (B, N, 1024))], axis=-1
        )  # [B, N, 1216]

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
