"""Shared flax building blocks for the MLSP model zoo.

Layout convention: point clouds/features are channels-last ([B, N, C] or
[B, N, K, C]); the reference's 1x1 Conv1d/Conv2d become `nn.Dense` over
the last axis, which XLA lowers to batched MXU matmuls. BatchNorm reduces
over every axis but the channel axis — the exact equivalent of torch
BatchNorm1d/2d on the [B, C, ...] layouts (torch defaults: eps 1e-5,
momentum 0.1 -> flax momentum 0.9).
"""

from __future__ import annotations

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn


def act_fn(name: str):
    if name == "relu":
        return nn.relu
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    raise ValueError(f"unknown activation {name!r}")


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact running-statistics semantics.

    Drop-in for `nn.BatchNorm` (same "scale"/"bias" params and
    "mean"/"var" batch_stats, same reduction over every axis but the
    last, same forward normalization with the BIASED batch variance) —
    but the running-variance update uses the UNBIASED (Bessel-corrected)
    variance, as torch `_BatchNorm` does. flax updates with the biased
    variance, which skews `running_var` by n/(n-1): negligible for
    per-point/edge norms (n = B*N or B*N*k) but ~3% for the
    classifier-head norms (n = B = 32) — visible in eval logits and in
    the train-trajectory differential vs the reference trainer.
    """

    use_running_average: bool
    momentum: float = 0.9  # flax convention: ra = m*ra + (1-m)*batch
    epsilon: float = 1e-5
    dtype: t.Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        axes = tuple(range(x.ndim - 1))
        gamma = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axes)
            # Two-pass variance, like torch: E[(x-mu)^2]. The one-pass
            # E[x^2]-mu^2 (flax fast variance) cancels catastrophically
            # when mu^2 >> var — measured 8% train-mode output error vs
            # torch on scan-occluded clouds (many exact-zero points).
            d = xf - mean
            var = jnp.mean(d * d, axes)  # biased (forward, torch-style)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon) * gamma + beta
        return y.astype(self.dtype if self.dtype is not None else x.dtype)


class SplitDense(nn.Module):
    """Dense over an implicit `concat([a, broadcast(b)], -1)` input.

    Mathematically identical to `nn.Dense` applied to the concatenation
    of per-point features a [..., N, Ca] with a per-cloud global feature
    b [..., Cb] broadcast over N — but the global part multiplies the
    kernel ONCE per cloud instead of once per point: the [..., N, Ca+Cb]
    tensor is never materialized, and the b-matmul shrinks from N rows
    to 1. For the MLSP heads (Ca=512, Cb=1024, N=1024) that removes
    ~2/3 of the first-layer FLOPs and ~200 MB of concat traffic per
    forward. The parameter is the SAME single [Ca+Cb, F] kernel as the
    fused layer (same name/shape/init), so checkpoints and the torch
    importer are unaffected.
    """

    features: int
    use_bias: bool = True
    dtype: t.Any = None

    @nn.compact
    def __call__(self, a, b):
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (ca + cb, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32) if self.use_bias else None)
        a, b, kernel, bias = nn.dtypes.promote_dtype(
            a, b, kernel, bias, dtype=self.dtype)
        y = a @ kernel[:ca] + (b @ kernel[ca:])[..., None, :]
        if bias is not None:
            y = y + bias
        return y


class DenseBN(nn.Module):
    """Dense -> BatchNorm -> activation (reference `conv_2d`/`fc_layer`).

    `dtype` sets the compute precision of the matmul (params stay f32);
    BatchNorm statistics always run in f32 for stability. bf16 compute
    doubles MXU throughput on TPU.

    `x` may be a `(per_point, global)` tuple, routed through
    :class:`SplitDense` (same params as the fused layer).
    """

    features: int
    activation: str = "relu"
    use_bias: bool = True
    use_bn: bool = True
    dtype: t.Any = None  # None -> input dtype

    @nn.compact
    def __call__(self, x, train: bool):
        if isinstance(x, tuple):
            x = SplitDense(self.features, use_bias=self.use_bias,
                           dtype=self.dtype, name="Dense_0")(*x)
        else:
            x = nn.Dense(self.features, use_bias=self.use_bias,
                         dtype=self.dtype)(x)
        if self.use_bn:
            x = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="BatchNorm_0",
            )(x).astype(x.dtype)
        return act_fn(self.activation)(x)


class TransformNet(nn.Module):
    """Spatial/feature transform net (reference `transform_net`,
    `PointDA/model_utils.py:90-127`).

    `dgcnn` mode consumes edge features [B, N, K, C] and max-reduces over
    K before the 1024-dim lift; `pointnet` mode consumes per-point
    features [B, N, C]. Output is a [B, out, out] matrix initialised at
    identity (bias trick).
    """

    out: int
    mode: str = "dgcnn"  # or "pointnet"
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        leaky = self.mode == "dgcnn"
        act = "leakyrelu" if leaky else "relu"
        bias = not leaky
        dt = self.dtype
        x = DenseBN(64, act, use_bias=bias, dtype=dt)(x, train)
        x = DenseBN(128, act, use_bias=bias, dtype=dt)(x, train)
        if self.mode == "dgcnn":
            x = jnp.max(x, axis=-2)  # over K
        x = DenseBN(1024, act, use_bias=bias, dtype=dt)(x, train)
        x = jnp.max(x, axis=-2)  # over N
        x = DenseBN(512, act, use_bias=bias, dtype=dt)(x, train)
        x = DenseBN(256, act, use_bias=True, dtype=dt)(x, train)
        x = nn.Dense(self.out * self.out, dtype=dt)(x)
        # The transform matrix multiplies raw coordinates: keep it f32.
        x = x.astype(jnp.float32)
        eye = jnp.eye(self.out, dtype=x.dtype).reshape(-1)
        x = x + eye
        return x.reshape(x.shape[0], self.out, self.out)


class Classifier(nn.Module):
    """Global-feature classifier head (`model_utils.classifier`)."""

    num_classes: int
    dropout: float = 0.5
    model: str = "dgcnn"  # controls activation/bias like the reference
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        leaky = self.model == "dgcnn"
        act = "leakyrelu" if leaky else "relu"
        dt = self.dtype
        x = DenseBN(512, act, use_bias=leaky, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(256, act, use_bias=True, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.num_classes, dtype=dt)(x).astype(jnp.float32)


class PointMLPHead(nn.Module):
    """Per-point 3-channel regression head.

    Covers `RegionReconstruction` and `Normal_prediction`
    (`PointDA/Models.py:165-231`): 256 -> 256 -> 128 -> out, BN + plain
    ReLU + dropout, all Dense bias-free.
    """

    out: int = 3
    dropout: float = 0.5
    use_bias: bool = False
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        dt = self.dtype
        x = DenseBN(256, "relu", use_bias=self.use_bias, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(256, "relu", use_bias=self.use_bias, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(128, "relu", use_bias=self.use_bias, dtype=dt)(x, train)
        return nn.Dense(self.out, use_bias=self.use_bias, dtype=dt)(x).astype(
            jnp.float32)


class DensityHead(nn.Module):
    """Cardinality head (`Density_prediction`, `PointDA/Models.py:233-285`).

    Per point: Dense 512 (BN+ReLU+dropout) -> MLP 256 -> 256 -> num_cls
    -> softmax p_vec; the scalar density is the expectation under the
    frozen bin-center weights w_i = pergroup * i.

    Returns (p_vec [B, N, num_cls], density [B, N]).
    """

    num_cls: int = 16
    pergroup: float = 2.0
    dropout: float = 0.5
    model: str = "dgcnn"
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        leaky = self.model == "dgcnn"
        act = "leakyrelu" if leaky else "relu"
        dt = self.dtype
        x = DenseBN(512, "relu", use_bias=False, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(256, act, use_bias=leaky, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = DenseBN(256, act, use_bias=True, dtype=dt)(x, train)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        logits = nn.Dense(self.num_cls, dtype=dt)(x).astype(jnp.float32)
        p_vec = jax.nn.softmax(logits, axis=-1)
        bins = self.pergroup * jnp.arange(self.num_cls, dtype=p_vec.dtype)
        density = jnp.einsum("...c,c->...", p_vec, bins)
        return p_vec, density
