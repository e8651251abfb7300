"""Hengshuang-style Point Transformer family (vector attention over kNN).

TPU-native port of `PointDA/hengshuang_transformer/` (models at
`hengshuang_model.py:1-211`, vector-attention block at
`transformer.py:7-44`, set-abstraction utilities at
`pointnet_util.py:1-311` — the reference's pure-torch FPS/kNN path):

  * `HengshuangTransformer` — `PointTransformerCls` (`hengshuang_model.py:79-97`)
    with the `PointTransformerDef` DefRec branch (`:140-206`): the full
    TransitionUp U-Net decoder back to all points, then a reconstruction
    head on [per-point 32-d ; broadcast global] (`RegionReconstruction(32+512)`).
  * `HengshuangSeg` — `PointTransformerSeg` (`hengshuang_model.py:99-139`):
    same decoder, per-point class logits via fc3; carries the DefRec head
    too so it can drive the PointSegDA trainer's SSL branch.

Vector attention (per point i over its k neighbours j):
  q_i, k_j, v_j = linear(x);  delta_ij = mlp(p_i - p_j)
  w_ij = softmax_j( mlp_gamma(q_i - k_j + delta_ij) )   (per channel)
  y_i  = sum_j w_ij * (v_j + delta_ij)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import DenseBN, PointMLPHead
from mlsp_tpu.models.transformer import feature_propagation
from mlsp_tpu.ops.fps import fps, fps_gather
from mlsp_tpu.ops.knn import knn_indices
from mlsp_tpu.ops.grouping import group_points


class VectorAttention(nn.Module):
    """`TransformerBlock` (`hengshuang_transformer/transformer.py:7-44`)."""

    d_model: int = 128
    k: int = 16
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, xyz, feats, train: bool):
        B, N, C = feats.shape
        pre = feats
        x = nn.Dense(self.d_model)(feats)
        q = nn.Dense(self.d_model, use_bias=False)(x)
        kf = nn.Dense(self.d_model, use_bias=False)(x)
        vf = nn.Dense(self.d_model, use_bias=False)(x)

        idx = knn_indices(xyz, min(self.k, N), backend=self.knn_backend)
        kk = idx.shape[-1]
        flat = idx.reshape(B, N * kk)
        k_j = jnp.take_along_axis(kf, flat[..., None], 1).reshape(B, N, kk, -1)
        v_j = jnp.take_along_axis(vf, flat[..., None], 1).reshape(B, N, kk, -1)
        p_j = jnp.take_along_axis(xyz, flat[..., None], 1).reshape(B, N, kk, 3)

        rel = xyz[:, :, None, :] - p_j  # p_i - p_j
        delta = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_model)(rel)))

        gamma_in = q[:, :, None, :] - k_j + delta
        gamma = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_model)(gamma_in)))
        # Per-channel softmax over neighbours, logits scaled by
        # 1/sqrt(d_model) (`transformer.py:42`: `attn / np.sqrt(k.size(-1))`).
        attn = jax.nn.softmax(gamma / jnp.sqrt(self.d_model), axis=-2)
        y = jnp.sum(attn * (v_j + delta), axis=-2)
        return nn.Dense(C)(y) + pre  # fc2 + residual


class TransitionDown(nn.Module):
    """FPS + kNN set abstraction (`pointnet_util.py:119-176` /
    `hengshuang_model.py` TransitionDown)."""

    npoint: int
    k: int = 16
    channels: int = 64
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, xyz, feats, train: bool):
        B = xyz.shape[0]
        idx = fps(xyz, self.npoint, jnp.zeros((B,), jnp.int32),
                  backend=self.knn_backend)
        centers = fps_gather(xyz, idx)
        nidx = knn_indices(centers, min(self.k, xyz.shape[1]), y=xyz,
                           backend=self.knn_backend)
        g = group_points(xyz, feats, centers, nidx)  # [B, S, k, 3+C]
        # Two conv+BN+ReLU stages like the reference SA mlp
        # ([channel, channel], `pointnet_util.py:166-172,191-194`).
        g = DenseBN(self.channels, "relu")(g, train)
        g = DenseBN(self.channels, "relu")(g, train)
        return centers, jnp.max(g, axis=-2)


class TransitionUp(nn.Module):
    """`TransitionUp` (`hengshuang_model.py:16-47`): project both scales
    to `dim_out` (Linear+BN+ReLU), 3-NN inverse-distance interpolate the
    coarse one onto the fine points, sum."""

    dim_out: int

    @nn.compact
    def __call__(self, xyz_c, f_c, xyz_f, f_f, train: bool):
        f1 = DenseBN(self.dim_out, "relu")(f_c, train)
        f2 = DenseBN(self.dim_out, "relu")(f_f, train)
        return feature_propagation(xyz_f, xyz_c, f1) + f2


class Backbone(nn.Module):
    """`Backbone` (`hengshuang_model.py:49-77`): per-point MLP +
    TransformerBlock, then `nblocks` x [TransitionDown -> TransformerBlock].

    Returns the list of (xyz, feats) per scale — [0] the full cloud at
    `base_dim` channels, [i] the i-th downsampling at base_dim * 2**i.
    """

    nblocks: int = 4
    nneighbor: int = 16
    d_model: int = 128
    base_dim: int = 32
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool):
        N = x.shape[1]
        feats = nn.Dense(self.base_dim)(nn.relu(nn.Dense(self.base_dim)(x)))
        feats = VectorAttention(self.d_model, self.nneighbor,
                                self.knn_backend)(x, feats, train)

        xyz, taps = x, [(x, feats)]
        for i in range(self.nblocks):
            ch = self.base_dim * 2 ** (i + 1)
            # level sizes exactly as the reference (`hengshuang_model.py:65`):
            # npoints // 4**(i+1), no neighbour floor (1024 -> 256/64/16/4)
            npoint = max(N // 4 ** (i + 1), 1)
            xyz, feats = TransitionDown(npoint, self.nneighbor, ch,
                                        self.knn_backend)(xyz, feats, train)
            feats = VectorAttention(self.d_model, self.nneighbor,
                                    self.knn_backend)(xyz, feats, train)
            taps.append((xyz, feats))
        return taps


class UpDecoder(nn.Module):
    """The seg/Def U-Net decoder (`hengshuang_model.py:104-139,145-206`):
    fc2 MLP + TransformerBlock at the coarsest scale, then per level
    TransitionUp -> TransformerBlock back to the full cloud."""

    nblocks: int = 4
    nneighbor: int = 16
    d_model: int = 128
    base_dim: int = 32
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, taps, train: bool):
        xyz, feats = taps[-1]
        ch_last = self.base_dim * 2 ** self.nblocks
        # fc2: plain Linear/ReLU stack (no BN), hengshuang_model.py:104-110.
        h = nn.relu(nn.Dense(512)(feats))
        h = nn.relu(nn.Dense(512)(h))
        h = nn.Dense(ch_last)(h)
        feats = VectorAttention(self.d_model, self.nneighbor,
                                self.knn_backend)(xyz, h, train)
        for i in reversed(range(self.nblocks)):
            ch = self.base_dim * 2 ** i
            xyz_f, f_f = taps[i]
            feats = TransitionUp(ch)(xyz, feats, xyz_f, f_f, train)
            feats = VectorAttention(self.d_model, self.nneighbor,
                                    self.knn_backend)(xyz_f, feats, train)
            xyz = xyz_f
        return feats  # [B, N, base_dim]


class HengshuangTransformer(nn.Module):
    """`PointTransformerCls` + the `PointTransformerDef` DefRec branch."""

    num_classes: int = 10
    nblocks: int = 4
    nneighbor: int = 16
    d_model: int = 128  # transformer_dim in the reference yaml
    base_dim: int = 32
    dropout: float = 0.5
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ()):
        taps = Backbone(self.nblocks, self.nneighbor, self.d_model,
                        self.base_dim, self.knn_backend)(x, train)
        feats = taps[-1][1]

        pooled = jnp.mean(feats, axis=1)
        # cls_head_finetune (`hengshuang_model.py:168-174`): plain
        # Linear/ReLU stack, no dropout.
        h = nn.relu(nn.Dense(256)(pooled))
        h = nn.relu(nn.Dense(64)(h))
        logits = {"feat": pooled, "cls": nn.Dense(self.num_classes)(h)}

        if "defrec" in heads:
            # PointTransformerDef (`hengshuang_model.py:188-206`): full
            # U-Net decode, then RegionReconstruction(32+512) on the
            # implicit concat [per-point 32-d | broadcast global]; the
            # head is the same 4-layer per-point module as everywhere
            # else (`Models.py:165-197`), SplitDense first layer.
            per_pt = UpDecoder(self.nblocks, self.nneighbor, self.d_model,
                               self.base_dim, self.knn_backend)(taps, train)
            logits["defrec"] = PointMLPHead(3, self.dropout, name="DefRec")(
                (per_pt, pooled), train)
        return logits


class HengshuangSeg(nn.Module):
    """`PointTransformerSeg` (`hengshuang_model.py:99-139`) with the Def
    branch's reconstruction head attached, so it can serve as a
    PointSegDA backbone (`--model hengshuang_seg`)."""

    num_classes: int = 8
    nblocks: int = 4
    nneighbor: int = 16
    d_model: int = 128
    base_dim: int = 32
    dropout: float = 0.5
    knn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ()):
        taps = Backbone(self.nblocks, self.nneighbor, self.d_model,
                        self.base_dim, self.knn_backend)(x, train)
        pooled = jnp.mean(taps[-1][1], axis=1)
        per_pt = UpDecoder(self.nblocks, self.nneighbor, self.d_model,
                           self.base_dim, self.knn_backend)(taps, train)

        # Heads are gated, so every layer is explicitly named — flax
        # auto-numbering would shift between head subsets otherwise.
        logits = {"feat": pooled}
        if not heads or "seg" in heads:
            # fc3 (`hengshuang_model.py:120-126`): per-point Linear stack.
            h = nn.relu(nn.Dense(64, name="seg_fc1")(per_pt))
            h = nn.relu(nn.Dense(64, name="seg_fc2")(h))
            logits["seg"] = nn.Dense(self.num_classes, name="seg_out")(h)
        if "defrec" in heads:
            logits["defrec"] = PointMLPHead(3, self.dropout, name="DefRec")(
                (per_pt, pooled), train)
        return logits
