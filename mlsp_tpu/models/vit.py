"""Point-ViT: the reference's ViT variant, redesigned to actually work.

The reference `ViT` (`PointDA/vit_utils.py:68-283`) is bit-rotted: its
`Encoder(..., use_relative=True)` call (`vit_utils.py:96`) does not match
any encoder constructor (`model_utils.py:293`), and the forward runs the
block stack twice (`vit_utils.py:203` then `:206`), so the class cannot
be instantiated, let alone trained. This module implements what that
code *intended*, as a working TPU-native model:

  * Group (FPS centers + kNN neighbourhoods) — shared with
    :class:`~mlsp_tpu.models.transformer.PointTransformer`;
  * a selectable group embedder mirroring the reference's four-way map
    (`vit_utils.py:95-103`): "pointnet" (the plain `Encoder`,
    `model_utils.py:292-336`, incl. its hardcoded `add_conv1` stage),
    "relative" (`Relative_Encoder`, `model_utils.py:338-399`:
    center-relative coords re-concatenated before every conv stage —
    the 515 = 512+3 channel quirk), "dgcnn" (`Dgcnn_Encoder`,
    `model_utils.py:401-452`), and "pointnet_tnet" (`Pointnet_Encoder`,
    `model_utils.py:454-507`);
  * a `reduce_dim` bridge (`vit_utils.py:106`);
  * ViT blocks with the positional embedding RE-ADDED at every block
    (`vit_utils.py:206` — the variant's distinguishing quirk vs
    `PointTransformer`, which adds pos once);
  * the ViT head: Linear(2D→256) + ReLU + Dropout + Linear(256→C)
    (`vit_utils.py:131-136`) on [cls ; max-pool tokens];
  * DefRec via 3-NN feature propagation of the fetch_idx=[3,7,11] taps
    (replacing the CUDA propagation pyramid, `vit_utils.py:216-240`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import PointMLPHead
from mlsp_tpu.models.transformer import (
    Block,
    GroupEncoder,
    feature_propagation,
    group_points_knn,
)


class RelativeGroupEncoder(nn.Module):
    """`Relative_Encoder` (`model_utils.py:338-399`), working form.

    Mini-PointNet over center-relative group coords where the raw
    relative coords are concatenated back in before the second and
    third conv stages (giving the reference's 515-channel convs).
    `use_absolute` additionally feeds absolute coords to the first
    stage (the reference's `use_obsolute` 6-channel path).

    Concats with a broadcast global half are expressed as sums of
    per-operand Dense maps (same algebra, and the v5e Mosaic compiler
    aborts on broadcast->concat->matmul fusions).
    """

    dim: int = 384
    use_absolute: bool = False

    @nn.compact
    def __call__(self, rel, centers, train: bool):
        # rel: [B, G, M, 3] center-relative; centers: [B, G, 3]
        x = rel
        if self.use_absolute:
            x = jnp.concatenate([rel, rel + centers[:, :, None, :]], axis=-1)
        from mlsp_tpu.models.layers import TorchBatchNorm

        h = nn.Dense(128)(x)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="BatchNorm_0")(h)
        h = nn.relu(h)
        h = nn.Dense(256)(h)  # [B, G, M, 256]

        def stage(h, width, out, bn_name):
            # Dense over concat([max_M(h) bcast, h, rel]) (515 channels)
            g = jnp.max(h, axis=-2, keepdims=True)  # [B, G, 1, 256]
            z = (nn.Dense(width)(g) + nn.Dense(width, use_bias=False)(h)
                 + nn.Dense(width, use_bias=False)(rel))
            z = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name=bn_name)(z)
            return nn.Dense(out)(nn.relu(z))

        h = stage(h, 515, 256, "BatchNorm_1")
        h = stage(h, 515, self.dim, "BatchNorm_2")
        return jnp.max(h, axis=-2)  # [B, G, dim]


class DgcnnGroupEncoder(nn.Module):
    """`Dgcnn_Encoder` (`model_utils.py:401-452`): a full DGCNN run per
    group — input T-net on edge features, 4 EdgeConv layers 64/64/128/256,
    a 512->dim lift, max-pool per group. Groups fold into the batch axis;
    k is clipped to the group size."""

    dim: int = 384
    k: int = 20
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, rel, train: bool):
        from mlsp_tpu.models.dgcnn import EdgeConv
        from mlsp_tpu.models.layers import DenseBN, TransformNet
        from mlsp_tpu.ops.knn import edge_features, knn_indices

        B, G, M, _ = rel.shape
        x = rel.reshape(B * G, M, 3)
        k = min(self.k, M)

        idx0 = knn_indices(x, k, backend=self.knn_backend)
        T = TransformNet(out=3, mode="dgcnn")(edge_features(x, idx0), train)
        x = jnp.einsum("bnc,bdc->bnd", x, T)

        feats = []
        for width in (64, 64, 128, 256):
            x = EdgeConv(width)(x, knn_indices(x, k, backend=self.knn_backend), train)
            feats.append(x)
        x = DenseBN(self.dim, "leakyrelu", use_bias=False)(
            jnp.concatenate(feats, axis=-1), train)
        return jnp.max(x, axis=-2).reshape(B, G, self.dim)


class PointnetGroupEncoder(nn.Module):
    """`Pointnet_Encoder` (`model_utils.py:454-507`): a PointNet run per
    group — two T-nets (3x3 input, 64x64 feature), convs 64/64/64/128/dim,
    max-pool per group. Groups fold into the batch axis."""

    dim: int = 384

    @nn.compact
    def __call__(self, rel, train: bool):
        from mlsp_tpu.models.layers import DenseBN, TransformNet

        B, G, M, _ = rel.shape
        x = rel.reshape(B * G, M, 3)

        T1 = TransformNet(out=3, mode="pointnet")(x, train)
        x = jnp.einsum("bnc,bcd->bnd", x, T1)
        x = DenseBN(64, "relu")(x, train)
        x2 = DenseBN(64, "relu")(x, train)
        T2 = TransformNet(out=64, mode="pointnet", name="trans_net2")(x2, train)
        x = jnp.einsum("bnc,bcd->bnd", x2, T2)
        x = DenseBN(64, "relu")(x, train)
        x = DenseBN(128, "relu")(x, train)
        x = DenseBN(self.dim, "relu")(x, train)
        return jnp.max(x, axis=-2).reshape(B, G, self.dim)


class PointViT(nn.Module):
    """Working redesign of the reference ViT variant (see module doc)."""

    num_classes: int = 10
    trans_dim: int = 384
    encoder_dims: int = 384
    depth: int = 12
    heads: int = 6
    num_group: int = 64
    group_size: int = 32
    dropout: float = 0.5
    # "relative" | "pointnet" | "dgcnn" | "pointnet_tnet"
    # (the reference's encoder_type map, vit_utils.py:95-103)
    encoder_type: str = "relative"
    # Feed absolute coords alongside relative ones to the "relative"
    # embedder's first stage (the reference's `use_obsolute` 6-channel
    # path, model_utils.py:345-351).
    use_absolute: bool = False
    fetch_idx: tuple[int, ...] = (3, 7, 11)
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = (),
                 rng_start=None):
        bad = [i for i in self.fetch_idx if i >= self.depth]
        if bad:
            raise ValueError(
                f"fetch_idx {bad} out of range for depth={self.depth}; "
                "set fetch_idx explicitly when reducing depth"
            )
        B, N, _ = x.shape
        start = jnp.zeros((B,), jnp.int32) if rng_start is None else rng_start
        rel, centers = group_points_knn(x, self.num_group, self.group_size,
                                        start, backend=self.knn_backend)
        # Reference encoder_type map (vit_utils.py:95-103): "relative" ->
        # Relative_Encoder, "pointnet" -> Encoder, "dgcnn" ->
        # Dgcnn_Encoder, "pointnet_tnet" -> Pointnet_Encoder.
        if self.encoder_type == "relative":
            tokens = RelativeGroupEncoder(
                self.encoder_dims, use_absolute=self.use_absolute
            )(rel, centers, train)
        elif self.encoder_type == "pointnet":
            tokens = GroupEncoder(self.encoder_dims)(rel, train)
        elif self.encoder_type == "dgcnn":
            tokens = DgcnnGroupEncoder(
                self.encoder_dims, knn_backend=self.knn_backend)(rel, train)
        elif self.encoder_type == "pointnet_tnet":
            tokens = PointnetGroupEncoder(self.encoder_dims)(rel, train)
        else:
            raise ValueError(f"unknown encoder_type {self.encoder_type!r}")
        tokens = nn.Dense(self.trans_dim, name="reduce_dim")(tokens)

        pos = nn.Dense(self.trans_dim)(nn.gelu(nn.Dense(128)(centers)))
        cls_tok = self.param("cls_token", nn.initializers.zeros,
                             (1, 1, self.trans_dim))
        cls_pos = self.param("cls_pos", nn.initializers.normal(1.0),
                             (1, 1, self.trans_dim))
        h = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (B, 1, self.trans_dim)), tokens], axis=1)
        p = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (B, 1, self.trans_dim)), pos], axis=1)

        taps = []
        for i in range(self.depth):
            # pos re-added at every block — the ViT variant's quirk
            # (vit_utils.py:206), kept as the defining difference from
            # PointTransformer.
            h = Block(self.trans_dim, self.heads, name=f"block{i}")(h + p, train)
            if i in self.fetch_idx:
                taps.append(h)
        norm = nn.LayerNorm()
        h = norm(h)

        feat = jnp.concatenate([h[:, 0], jnp.max(h[:, 1:], axis=1)], axis=-1)
        logits = {"feat": feat}
        # ViT head (vit_utils.py:131-136): Linear -> ReLU -> Dropout ->
        # Linear, no BN.
        c = nn.relu(nn.Dense(256, name="head_fc1")(feat))
        c = nn.Dropout(self.dropout, deterministic=not train)(c)
        logits["cls"] = nn.Dense(self.num_classes, name="head_fc2")(c)

        if "defrec" in heads:
            # The reference norms each tap before propagation
            # (vit_utils.py:217); shares this LayerNorm's params.
            tap_feats = jnp.concatenate([norm(t)[:, 1:] for t in taps],
                                        axis=-1)  # [B, G, 3D]
            per_pt = feature_propagation(x, centers, tap_feats)  # [B, N, 3D]
            logits["defrec"] = PointMLPHead(3, self.dropout, name="DefRec")(
                (per_pt, feat), train)
        return logits
