"""Point Transformer: group-token ViT encoder with cls + DefRec heads.

TPU-native redesign of the reference transformer path
(`PointDA/Models.py:289-531` `PointTransformer`, `model_utils.py:170-599`
`Group`/`Encoder`/`TransformerEncoder`/`PointNetFeaturePropagation`).
The reference's variants (timm-based `ViT`, hengshuang) are bit-rotted/
unused; this is the one working flavour, built from the same pieces:

  Group (FPS centers + kNN neighbourhoods, center-normalised)
  -> mini-PointNet group embedder -> [CLS] + learned pos-embed
  -> pre-LN ViT blocks (MXU attention over G+1 tokens)
  -> classifier on [cls ; max-pool tokens]
  -> DefRec branch: 3-NN inverse-distance feature propagation of
     multi-depth token features back to all N points + per-point head
     (replaces the reference's CUDA DGCNN_Propagation pyramid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import DenseBN, PointMLPHead
from mlsp_tpu.ops.fps import fps, fps_gather
from mlsp_tpu.ops.knn import knn_indices
from mlsp_tpu.ops.pairwise import pairwise_sqdist


def group_points_knn(xyz: jax.Array, num_group: int, group_size: int,
                     start_idx: jax.Array, backend: str = "auto"):
    """`Group.forward` (`model_utils.py:177-198`): FPS centers, kNN
    neighbourhoods, normalised by center.

    Returns (neighborhood [B, G, M, 3], centers [B, G, 3]).
    """
    idx = fps(xyz, num_group, start_idx, backend=backend)
    centers = fps_gather(xyz, idx)
    nidx = knn_indices(centers, group_size, y=xyz,
                       backend=backend)  # [B, G, M] into xyz
    B, G, M = nidx.shape
    flat = nidx.reshape(B, G * M)
    neigh = jnp.take_along_axis(xyz, flat[..., None], axis=1).reshape(B, G, M, 3)
    return neigh - centers[:, :, None, :], centers


def feature_propagation(xyz_dst, xyz_src, feats_src, k: int = 3):
    """3-NN inverse-distance interpolation
    (`PointNetFeaturePropagation`, `model_utils.py:549-599`; with a
    single source point the weights collapse to 1 — the reference's
    `S == 1` repeat branch)."""
    k = min(k, xyz_src.shape[1])
    d = pairwise_sqdist(xyz_dst, xyz_src)  # [B, Nd, Ns]
    neg, idx = jax.lax.top_k(-d, k)
    w = 1.0 / (-neg + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)  # [B, Nd, k]
    B, Nd, _ = idx.shape
    C = feats_src.shape[-1]
    g = jnp.take_along_axis(
        feats_src, idx.reshape(B, Nd * k)[..., None], axis=1
    ).reshape(B, Nd, k, C)
    return jnp.sum(g * w[..., None], axis=2)


class GroupEncoder(nn.Module):
    """Mini-PointNet group embedder (`Encoder`, `model_utils.py:292-336`).

    Three stages, matching the reference with its hardcoded
    ``addconv=True`` (`model_utils.py:302-309`): first_conv (3->128->256),
    add_conv1 (concat global -> 512->512->256), second_conv (concat
    global -> 512->512->dim), max-pool per group.
    """

    dim: int = 384

    @nn.compact
    def __call__(self, neigh, train: bool):
        # neigh: [B, G, M, 3]
        h = DenseBN(128, "relu")(neigh, train)
        h = nn.Dense(256)(h)

        from mlsp_tpu.models.layers import TorchBatchNorm

        def stage(h, out, bn_name):
            g = jnp.max(h, axis=-2, keepdims=True)  # [B, G, 1, 256]
            # Dense over concat([broadcast(g), h]) expressed as the sum of
            # two matmuls: identical algebra, skips materialising the
            # 512-wide concat, and avoids a Mosaic compiler abort on the
            # broadcast->concat->matmul fusion (seen on v5e remote compile).
            z = nn.Dense(512)(g) + nn.Dense(512, use_bias=False)(h)
            z = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, name=bn_name)(z)
            return nn.Dense(out)(nn.relu(z))

        h = stage(h, 256, "BatchNorm_0")  # add_conv1 (`model_utils.py:303-309,331-334`)
        z = stage(h, self.dim, "BatchNorm_1")  # second_conv
        return jnp.max(z, axis=-2)  # [B, G, dim]


class Block(nn.Module):
    """Pre-LN ViT block (`model_utils.py:201-266`)."""

    dim: int
    heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim,
            dropout_rate=self.dropout, deterministic=not train,
        )(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio))(h)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        return x + h


class PointTransformer(nn.Module):
    """trans_dim 384 / depth 12 / heads 6 / 64 groups x 32 pts / 256-dim
    group encoder + reduce_dim bridge (`PointDA/config/
    PointTransformer.yaml`, `Models.py:370-438`).

    Stage-exact with the reference backbone (`Models.py:472-496`):
    encoder -> reduce_dim -> [CLS] concat -> blocks with the pos embed
    RE-ADDED at every block (`model_utils.py:283-289`) -> final
    LayerNorm -> cls head Linear(768,256)+ReLU+Dropout+Linear — so
    reference-pretrained checkpoints import directly
    (`utils/torch_import.py::import_point_transformer`, the
    `load_model_from_ckpt` path at `Models.py:446-470`). The DefRec
    branch replaces the CUDA propagation pyramid with 3-NN feature
    propagation of the (final-norm-applied) fetch_idx taps.
    """

    num_classes: int = 10
    trans_dim: int = 384
    depth: int = 12
    heads: int = 6
    num_group: int = 64
    group_size: int = 32
    encoder_dims: int = 256
    dropout: float = 0.5
    fetch_idx: tuple[int, ...] = (3, 7, 11)
    knn_backend: str = "auto"  # "xla" pins the grouping to pure-XLA
    # kernels (platform-portable, e.g. for AOT serving bundles)

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = (),
                 rng_start=None):
        B, N, _ = x.shape
        start = jnp.zeros((B,), jnp.int32) if rng_start is None else rng_start
        neigh, centers = group_points_knn(x, self.num_group, self.group_size,
                                          start, backend=self.knn_backend)
        tokens = GroupEncoder(self.encoder_dims)(neigh, train)  # [B, G, E]
        tokens = nn.Dense(self.trans_dim, name="reduce_dim")(tokens)

        pos = nn.Dense(self.trans_dim, name="pos_embed_1")(
            nn.gelu(nn.Dense(128, name="pos_embed_0")(centers))
        )  # learned pos embed of centers (Models.py:398-402)
        cls_tok = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02),
            (1, 1, self.trans_dim),
        )
        cls_pos = self.param(
            "cls_pos", nn.initializers.truncated_normal(0.02),
            (1, 1, self.trans_dim),
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(cls_tok, (B, 1, self.trans_dim)), tokens], axis=1
        )
        p = jnp.concatenate(
            [jnp.broadcast_to(cls_pos, (B, 1, self.trans_dim)), pos], axis=1
        )

        final_norm = nn.LayerNorm(name="norm")
        taps = []
        for i in range(self.depth):
            # pos re-added at EVERY block (`model_utils.py:287`)
            h = Block(self.trans_dim, self.heads, name=f"block{i}")(h + p, train)
            if i in self.fetch_idx:
                taps.append(h)
        h = final_norm(h)

        feat = jnp.concatenate([h[:, 0], jnp.max(h[:, 1:], axis=1)], axis=-1)
        logits = {"feat": feat}
        # cls_head_finetune (`Models.py:414-419`)
        ch = nn.relu(nn.Dense(256, name="cls_head_0")(feat))
        ch = nn.Dropout(self.dropout, deterministic=not train)(ch)
        logits["cls"] = nn.Dense(self.num_classes, name="cls_head_1")(ch)

        if "defrec" in heads:
            # Propagate multi-depth group tokens (final-norm applied,
            # `Models.py:501`) to every point — replaces the CUDA
            # DGCNN_Propagation pyramid (Models.py:489-531).
            tap_feats = jnp.concatenate(
                [final_norm(t)[:, 1:] for t in taps], axis=-1
            )  # [B, G, 3*D]
            per_pt = feature_propagation(x, centers, tap_feats)  # [B, N, 3D]
            # Implicit concat [per_pt | broadcast(feat)]; first Dense
            # runs split (layers.SplitDense), global half per cloud.
            logits["defrec"] = PointMLPHead(3, self.dropout, name="DefRec")(
                (per_pt, feat), train
            )
        return logits
