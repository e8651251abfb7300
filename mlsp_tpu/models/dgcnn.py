"""DGCNN encoder with MLSP multi-task heads (flagship model).

TPU-native re-design of the reference `DGCNN` (`PointDA/Models.py:82-162`):
channels-last, EdgeConv = kNN gather + Dense + max-over-k (all MXU/VPU
work), heads selected by a static `heads` tuple instead of boolean
`activate_*` flags so each variant jits to a lean graph.

Head names: "cls" (always), "defrec", "normal", "scan", "density".
The reference's `activate_density_normal_ondef` == heads=("defrec",
"normal", "density").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import (
    Classifier,
    DenseBN,
    DensityHead,
    PointMLPHead,
    TransformNet,
)
from mlsp_tpu.ops.knn import edge_features, knn_indices


class DGCNN(nn.Module):
    num_classes: int = 10
    k: int = 20
    dropout: float = 0.5
    density_num_cls: int = 16
    pergroup: float = 2.0
    knn_backend: str = "auto"

    def _edge(self, x):
        idx = knn_indices(x, self.k, backend=self.knn_backend)
        return edge_features(x, idx)

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ()):
        """x: [B, N, 3] -> dict of logits.

        Always returns "cls" [B, num_classes] and "feat" [B, 1024]
        (the visualization feature); per-point heads as requested.
        """
        B, N, _ = x.shape

        # Input spatial transform (3x3) from edge features of raw coords.
        x0 = self._edge(x)  # [B, N, k, 6]
        T = TransformNet(out=3, mode="dgcnn")(x0, train)
        # torch does T @ x_col; channels-last equivalent is x_row @ T^T.
        x = jnp.einsum("bnc,bdc->bnd", x, T)

        lrelu = "leakyrelu"
        h = DenseBN(64, lrelu, use_bias=False)(self._edge(x), train)
        x1 = jnp.max(h, axis=-2)
        h = DenseBN(64, lrelu, use_bias=False)(self._edge(x1), train)
        x2 = jnp.max(h, axis=-2)
        h = DenseBN(128, lrelu, use_bias=False)(self._edge(x2), train)
        x3 = jnp.max(h, axis=-2)
        h = DenseBN(256, lrelu, use_bias=False)(self._edge(x3), train)
        x4 = jnp.max(h, axis=-2)

        x_cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 512]
        x5 = DenseBN(1024, lrelu, use_bias=False)(x_cat, train)
        x5 = jnp.max(x5, axis=1)  # global feature [B, 1024]

        logits = {"feat": x5}
        logits["cls"] = Classifier(self.num_classes, self.dropout, "dgcnn")(x5, train)

        if heads:
            pp = jnp.concatenate(
                [x_cat, jnp.broadcast_to(x5[:, None, :], (B, N, 1024))], axis=-1
            )  # [B, N, 1536]
            if "defrec" in heads:
                logits["defrec"] = PointMLPHead(3, self.dropout, name="DefRec")(pp, train)
            if "normal" in heads:
                logits["normal"] = PointMLPHead(3, self.dropout, name="NormPred")(pp, train)
            if "scan" in heads:
                logits["scan"] = PointMLPHead(3, self.dropout, name="RecScan")(pp, train)
            if "density" in heads:
                p_vec, dens = DensityHead(
                    self.density_num_cls, self.pergroup, self.dropout, "dgcnn",
                    name="DensityCls",
                )(pp, train)
                logits["density"] = p_vec
                logits["density_mse"] = dens
        return logits
