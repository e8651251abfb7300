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

import typing as t

import jax
import jax.numpy as jnp
from flax import linen as nn

from mlsp_tpu.models.layers import (
    Classifier,
    DenseBN,
    DensityHead,
    PointMLPHead,
    TransformNet,
    act_fn,
)
from mlsp_tpu.ops.knn import edge_features, knn_gather, knn_indices


class EdgeConv(nn.Module):
    """EdgeConv + max, in decomposed form.

    The reference computes `max_k act(BN(W @ concat(x_j - x_i, x_i)))`
    over [B, N, k, 2C] (`model_utils.py:18-42` + `conv_2d`). With the
    1x1 conv split as W = [W_d | W_c], the edge value equals
    `u_j - u_i + v_i` for u = W_d x, v = W_c x — two matmuls over N
    points instead of one over N*k positions (k-fold fewer MXU FLOPs and
    a C_out-wide gather instead of 2C). BN/activation still see the full
    edge tensor, so statistics and outputs match the reference layer
    exactly (convs are bias-free in DGCNN).
    """

    features: int
    activation: str = "leakyrelu"
    dtype: t.Any = None

    @nn.compact
    def __call__(self, x, idx, train: bool):
        u = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name="w_diff")(x)
        v = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name="w_center")(x)
        z = knn_gather(u, idx) + (v - u)[:, :, None, :]  # [B, N, k, C]
        from mlsp_tpu.models.layers import TorchBatchNorm

        z = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=jnp.float32,
                           name="BatchNorm_0")(z).astype(z.dtype)
        return jnp.max(act_fn(self.activation)(z), axis=-2)


class EdgeConvM(nn.Module):
    """EdgeConv + BN + LeakyReLU + max via neighbourhood moments.

    Mathematically identical to :class:`EdgeConv`, but never applies BN
    to the [B, N, k, C] edge tensor. With z_ij = u_j + c_i (c = v - u):

      E[z]    = E[mean_k u_j] + E[c]
      E[z^2]  = E[mean_k u_j^2 + 2 c mean_k u_j + c^2]
      max_j act(BN(z)) = act(s * ((s>=0 ? max_j u_j : min_j u_j) + c - mu)
                              + beta),   s = gamma / sqrt(var + eps)

    (affine BN + monotone LeakyReLU commute with the j-max; negative
    gamma flips max to min). One gather feeds four fused reductions, so
    neighbour bytes move once instead of twice, and eval mode skips the
    moment gathers entirely.
    """

    features: int
    dtype: t.Any = None
    gather_dtype: t.Any = None  # round only the gathered neighbour bytes
    # (graph + weights stay f32) — halves the dominant gather traffic
    momentum: float = 0.9
    eps: float = 1e-5
    kernel_k: int = 0  # >0: fused Pallas edge-moments kernel — kNN build
    # + all four neighbourhood statistics in one gather/scatter-free
    # kernel (`ops/pallas/edge_pallas.py`); `idx` is then ignored and the
    # graph is built on `x` inside the kernel. Opt-in: on this image's
    # throttled chip the per-row XLA sparse path measures faster
    # (scripts/perf_edge_fused.py); on full-rate silicon the fused
    # roofline wins. f32 only (gather_dtype is ignored).

    @nn.compact
    def __call__(self, x, idx, train: bool):
        u = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name="w_diff")(x)
        v = nn.Dense(self.features, use_bias=False, dtype=self.dtype,
                     name="w_center")(x)
        if self.gather_dtype is not None and not self.kernel_k:
            u = u.astype(self.gather_dtype)
            v = v.astype(self.gather_dtype)
        c = v - u

        gamma = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,), jnp.float32))

        if self.kernel_k:
            from mlsp_tpu.ops.pallas.edge_pallas import edge_moments

            interp = jax.default_backend() != "tpu"
            xg = x.astype(jnp.float32)
            if train:
                mx, mn, s1k, s2k = edge_moments(xg, u.astype(jnp.float32),
                                                self.kernel_k, True,
                                                interpret=interp)
                s1, s2 = s1k / self.kernel_k, s2k / self.kernel_k
            else:
                mx, mn = edge_moments(xg, u.astype(jnp.float32),
                                      self.kernel_k, False, interpret=interp)
        else:
            g = knn_gather(u, idx)  # [B, N, k, C] — single neighbour pass
            mx = jnp.max(g, axis=-2)
            mn = jnp.min(g, axis=-2)
            if train:
                gf = g.astype(jnp.float32)
                s1 = jnp.mean(gf, axis=-2)
                s2 = jnp.mean(gf * gf, axis=-2)

        if train:
            cf = c.astype(jnp.float32)
            mu = jnp.mean(s1 + cf, axis=(0, 1))
            ez2 = jnp.mean(s2 + 2.0 * cf * s1 + cf * cf, axis=(0, 1))
            var = jnp.maximum(ez2 - mu * mu, 0.0)
            if not self.is_initializing():
                # Torch updates running_var with the UNBIASED variance of
                # the virtual [B, N, k, C] edge tensor (n = B*N*k elements
                # per channel) — see layers.TorchBatchNorm.
                B, N = x.shape[0], x.shape[1]
                k = self.kernel_k if self.kernel_k else idx.shape[-1]
                n = B * N * k
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mu
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mu, var = ra_mean.value, ra_var.value
        s = gamma * jax.lax.rsqrt(var + self.eps)
        sel = jnp.where(s >= 0, mx.astype(jnp.float32), mn.astype(jnp.float32))
        y = s * (sel + c.astype(jnp.float32) - mu) + beta
        # Output keeps the layer compute dtype — NOT gather_dtype, so the
        # next stage's kNN graph is built from unrounded features.
        out_dtype = x.dtype if self.dtype is None else self.dtype
        return act_fn("leakyrelu")(y).astype(out_dtype)


class DGCNN(nn.Module):
    num_classes: int = 10
    k: int = 20
    dropout: float = 0.5
    density_num_cls: int = 16
    pergroup: float = 2.0
    knn_backend: str = "auto"
    dtype: t.Any = None  # compute dtype for the dense/conv path (e.g. bf16)
    head_dtype: t.Any = None  # separate dtype for the per-point heads: they
    # carry most of the FLOPs and no kNN-graph dependency, so bf16 here is
    # safe when full-bf16 hurts convergence
    gather_dtype: t.Any = None  # EdgeConv neighbour-gather dtype (see EdgeConvM)
    edge_impl: str = "auto"  # "auto" (per-chip measured A/B, cached —
    # utils/chipcal.py) | "moments" (1 neighbour pass, XLA gather/
    # scatter; wins on this image's throttled dev chip) | "direct" |
    # "fused" (gather/scatter-free Pallas edge-moments kernel — see
    # EdgeConvM.kernel_k; ~10x roofline win on full-rate silicon)

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
        T = TransformNet(out=3, mode="dgcnn", dtype=self.dtype)(x0, train)
        # torch does T @ x_col; channels-last equivalent is x_row @ T^T.
        x = jnp.einsum("bnc,bdc->bnd", x, T)
        if self.dtype is not None:
            x = x.astype(self.dtype)

        dt = self.dtype

        def knn_idx(feats):
            return knn_indices(feats, self.k, backend=self.knn_backend)

        def layer(c_out, feats):
            """One EdgeConv layer under the (possibly per-layer) dispatch.

            "auto" resolves PER LAYER SHAPE: the moments/fused ratio is
            shape-dependent (utils/chipcal.py SHAPES grid), so on
            near-crossover silicon the C=256 layer can pick a different
            implementation than the C=64 ones. The cost shape is the
            layer's OUTPUT width: EdgeConvM projects to ``c_out`` first
            and its gather/moments (and the fused kernel's reductions)
            run at that width, so dispatch resolves on ``c_out``, not
            the input width.
            """
            impl = self.edge_impl
            if impl == "auto":
                from mlsp_tpu.utils import chipcal

                impl = chipcal.edge_impl(n=N, c=c_out)
            if impl == "fused":
                ec = EdgeConvM(c_out, kernel_k=self.k, dtype=dt)
                return ec(feats, None, train)  # kNN built in-kernel
            if impl == "moments":
                ec = EdgeConvM(c_out, gather_dtype=self.gather_dtype,
                               dtype=dt)
            else:
                ec = EdgeConv(c_out, dtype=dt)
            return ec(feats, knn_idx(feats), train)

        x1 = layer(64, x)
        x2 = layer(64, x1)
        x3 = layer(128, x2)
        x4 = layer(256, x3)

        x_cat = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 512]
        x5 = DenseBN(1024, "leakyrelu", use_bias=False, dtype=dt)(x_cat, train)
        x5 = jnp.max(x5, axis=1)  # global feature [B, 1024]

        logits = {"feat": x5.astype(jnp.float32)}
        logits["cls"] = Classifier(self.num_classes, self.dropout, "dgcnn",
                                   dtype=dt)(x5, train)

        if heads:
            hdt = self.head_dtype if self.head_dtype is not None else dt
            # Implicit concat [x_cat | broadcast(x5)] ([B, N, 1536]): the
            # heads' first Dense runs in split form (SplitDense) so the
            # global-feature half multiplies its kernel once per cloud,
            # not once per point, and the concat is never materialized.
            pp = (x_cat, x5)
            if hdt is not None:
                pp = (x_cat.astype(hdt), x5.astype(hdt))
            if "defrec" in heads:
                logits["defrec"] = PointMLPHead(3, self.dropout, dtype=hdt,
                                                name="DefRec")(pp, train)
            if "normal" in heads:
                logits["normal"] = PointMLPHead(3, self.dropout, dtype=hdt,
                                                name="NormPred")(pp, train)
            if "scan" in heads:
                logits["scan"] = PointMLPHead(3, self.dropout, dtype=hdt,
                                              name="RecScan")(pp, train)
            if "density" in heads:
                p_vec, dens = DensityHead(
                    self.density_num_cls, self.pergroup, self.dropout, "dgcnn",
                    dtype=hdt, name="DensityCls",
                )(pp, train)
                logits["density"] = p_vec
                logits["density_mse"] = dens
        return logits
