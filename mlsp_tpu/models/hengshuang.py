"""Hengshuang-style Point Transformer (vector attention over kNN).

TPU-native port of `PointDA/hengshuang_transformer/` (model at
`hengshuang_model.py:1-211`, vector-attention block at
`transformer.py:7-44`, set-abstraction utilities at
`pointnet_util.py:1-311` — the reference's pure-torch FPS/kNN path):

  Backbone: per-point MLP -> TransformerBlock, then `nblocks` x
  [TransitionDown (FPS + kNN set abstraction) -> TransformerBlock].
  Cls head on the mean of the final tokens; a DefRec variant propagates
  multi-scale features back to all points (TransitionUp analog) for the
  per-point reconstruction head.

Vector attention (per point i over its k neighbours j):
  q_i, k_j, v_j = linear(x);  delta_ij = mlp(p_i - p_j)
  w_ij = softmax_j( mlp_gamma(q_i - k_j + delta_ij) )   (per channel)
  y_i  = sum_j w_ij * (v_j + delta_ij)
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import DenseBN
from mlsp_tpu.models.transformer import feature_propagation
from mlsp_tpu.ops.fps import fps, fps_gather
from mlsp_tpu.ops.knn import knn_indices
from mlsp_tpu.ops.grouping import group_points


class VectorAttention(nn.Module):
    """`TransformerBlock` (`hengshuang_transformer/transformer.py:7-44`)."""

    d_model: int = 128
    k: int = 16

    @nn.compact
    def __call__(self, xyz, feats, train: bool):
        B, N, C = feats.shape
        pre = feats
        x = nn.Dense(self.d_model)(feats)
        q = nn.Dense(self.d_model, use_bias=False)(x)
        kf = nn.Dense(self.d_model, use_bias=False)(x)
        vf = nn.Dense(self.d_model, use_bias=False)(x)

        idx = knn_indices(xyz, min(self.k, N))
        kk = idx.shape[-1]
        flat = idx.reshape(B, N * kk)
        k_j = jnp.take_along_axis(kf, flat[..., None], 1).reshape(B, N, kk, -1)
        v_j = jnp.take_along_axis(vf, flat[..., None], 1).reshape(B, N, kk, -1)
        p_j = jnp.take_along_axis(xyz, flat[..., None], 1).reshape(B, N, kk, 3)

        rel = xyz[:, :, None, :] - p_j  # p_i - p_j
        delta = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_model)(rel)))

        gamma_in = q[:, :, None, :] - k_j + delta
        gamma = nn.Dense(self.d_model)(nn.relu(nn.Dense(self.d_model)(gamma_in)))
        attn = jax.nn.softmax(gamma, axis=-2)  # over neighbours, per channel
        y = jnp.sum(attn * (v_j + delta), axis=-2)
        return nn.Dense(C)(y) + pre  # fc2 + residual


class TransitionDown(nn.Module):
    """FPS + kNN set abstraction (`pointnet_util.py:119-176` /
    `hengshuang_model.py` TransitionDown)."""

    npoint: int
    k: int = 16
    channels: int = 64

    @nn.compact
    def __call__(self, xyz, feats, train: bool):
        B = xyz.shape[0]
        idx = fps(xyz, self.npoint, jnp.zeros((B,), jnp.int32))
        centers = fps_gather(xyz, idx)
        nidx = knn_indices(centers, self.k, y=xyz)
        g = group_points(xyz, feats, centers, nidx)  # [B, S, k, 3+C]
        g = DenseBN(self.channels, "relu")(g, train)
        return centers, jnp.max(g, axis=-2)


class HengshuangTransformer(nn.Module):
    """`PointTransformerCls` (+ optional DefRec branch)."""

    num_classes: int = 10
    nblocks: int = 4
    nneighbor: int = 16
    d_model: int = 128  # transformer_dim in the reference yaml
    base_dim: int = 32
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False, heads: tuple[str, ...] = ()):
        B, N, _ = x.shape
        feats = nn.Dense(self.base_dim)(nn.relu(nn.Dense(self.base_dim)(x)))
        feats = VectorAttention(self.d_model, self.nneighbor)(x, feats, train)

        xyz, taps = x, [(x, feats)]
        for i in range(self.nblocks):
            ch = self.base_dim * 2 ** (i + 1)
            npoint = max(N // 4 ** (i + 1), self.nneighbor)
            xyz, feats = TransitionDown(npoint, self.nneighbor, ch)(xyz, feats, train)
            feats = VectorAttention(self.d_model, self.nneighbor)(xyz, feats, train)
            taps.append((xyz, feats))

        pooled = jnp.mean(feats, axis=1)
        h = nn.relu(nn.Dense(256)(pooled))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.relu(nn.Dense(64)(h))
        logits = {"feat": pooled, "cls": nn.Dense(self.num_classes)(h)}

        if "defrec" in heads:
            # TransitionUp analog: interpolate every scale back to the
            # full cloud and concatenate (hengshuang PointTransformerDef).
            ups = [taps[0][1]]
            for sxyz, sfeat in taps[1:]:
                ups.append(feature_propagation(x, sxyz, sfeat))
            # Implicit concat [ups | broadcast(pooled)]; first Dense runs
            # split (layers.SplitDense), global half per cloud.
            pp = (jnp.concatenate(ups, axis=-1), pooled)
            h = DenseBN(256, "relu")(pp, train)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = DenseBN(128, "relu")(h, train)
            logits["defrec"] = nn.Dense(3)(h)
        return logits
