"""PointNet encoder with classifier + DefRec heads.

Port of the reference `PointNet` (`PointDA/Models.py:26-79`): two T-nets
(3x3 input, 64x64 feature), per-point MLP 64-64-64-128-1024, global max
pool. Heads: classifier and region reconstruction.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import Classifier, DenseBN, PointMLPHead, TransformNet


class PointNet(nn.Module):
    num_classes: int = 10
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ()):
        """x: [B, N, 3] -> {"cls", "feat"[, "defrec"]}."""
        B, N, _ = x.shape
        relu = "relu"

        T1 = TransformNet(out=3, mode="pointnet")(x, train)
        x = jnp.einsum("bnc,bcd->bnd", x, T1)  # torch bmm(x_row, T)

        x1 = DenseBN(64, relu)(x, train)
        x2 = DenseBN(64, relu)(x1, train)
        T2 = TransformNet(out=64, mode="pointnet", name="trans_net2")(x2, train)
        x = jnp.einsum("bnc,bcd->bnd", x2, T2)
        x3 = DenseBN(64, relu)(x, train)
        x4 = DenseBN(128, relu)(x3, train)
        x_cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 320]

        h = DenseBN(1024, relu)(x4, train)
        x5 = jnp.max(h, axis=1)  # [B, 1024]

        logits = {"feat": x5}
        logits["cls"] = Classifier(self.num_classes, self.dropout, "pointnet")(x5, train)
        if "defrec" in heads:
            # Implicit concat [x_cat | broadcast(x5)]; first Dense runs
            # split (layers.SplitDense) so the global half is per-cloud.
            logits["defrec"] = PointMLPHead(3, self.dropout, name="DefRec")(
                (x_cat, x5), train)
        return logits
