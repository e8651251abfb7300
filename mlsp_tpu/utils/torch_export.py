"""Export mlsp_tpu checkpoints as reference PyTorch state_dicts.

The inverse of `torch_import`: maps flax variables onto the exact
state_dict layout the reference models load (`torch.save` format the
reference's `utils/log.py:31-41` emits), so a model trained here can be
dropped back into the reference's own evaluation / SPST / deployment
stack with a strict `load_state_dict`. Covered models:

  * `export_dgcnn`     — PointDA `DGCNN` (`PointDA/Models.py:82-162`)
  * `export_pointnet`  — PointDA `PointNet` (`PointDA/Models.py:26-79`)
  * `export_dgcnn_seg` — PointSegDA `DGCNN_DefRec`
                         (`PointSegDA/Models.py:197-386`)

Layout translations (inverse of `torch_import`):
  * Dense kernel [in, out] -> Conv1d/Conv2d 1x1 weight [out, in, 1(,1)]
    or Linear weight [out, in].
  * Decomposed EdgeConv (w_diff, w_center) -> the torch conv's single
    concat weight W = [W_d | W_c] over (x_j - x_i, x_i).
  * BatchNorm: scale->weight, bias->bias, batch_stats->running_*,
    plus the `num_batches_tracked` buffer torch checkpoints carry.
  * Density head: the analytic frozen expectation layer materialises as
    `fc2.weight` = pergroup * arange(num_cls) (`PointDA/Models.py:267-270`).
  * Seg `LinearEdgeBlock`: the flax block trains two independent
    second-stage maps (diff chain D1·D0, center chain C1·C0 + bias); the
    torch `shared_layers` double-conv computes V(W_d Δ + W_c x + b_a)+b_b
    — an exactly equivalent parameterisation exists whenever D1 is
    invertible:  V=D1, W_d=D0, W_c=D1⁻¹ C1 C0, b_a=0, b_b=C1 c0 + c1
    (constants and per-point terms commute with the max over neighbours,
    `PointSegDA/Models.py:159-191`). The solve uses a pseudo-inverse and
    warns if the reconstruction residual is not tiny.

Every exported tensor is float32 except `num_batches_tracked` (int64 0).
`save_torch_checkpoint` writes the dict with `torch.save` (the only
torch dependency; the mapping itself is pure numpy).
"""

from __future__ import annotations

import warnings

import numpy as np

from mlsp_tpu.utils.torch_import import (
    CheckpointMismatchError,
    _edge_block_name,
)

# Residual ‖D1·W_c − C1·C0‖/‖C1·C0‖ above which the seg double-block
# solve is reported as lossy (D1 effectively rank-deficient).
_SOLVE_RTOL = 1e-4


def _f32(x) -> np.ndarray:
    return np.asarray(x, np.float32)


class _Exporter:
    """Builds a torch state_dict from flax params/batch_stats."""

    def __init__(self, variables: dict, model_name: str):
        import jax

        self.model_name = model_name
        self.params = jax.tree_util.tree_map(np.asarray, variables["params"])
        self.bstats = jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {}))
        self.out: dict[str, np.ndarray] = {}
        self.missing: list[str] = []

    # -- source access ------------------------------------------------------
    def node(self, path, stats: bool = False):
        node = self.bstats if stats else self.params
        for k in path:
            if k not in node:
                raise KeyError("/".join(path))
            node = node[k]
        return node

    def has(self, name: str) -> bool:
        return name in self.params

    # -- destinations -------------------------------------------------------
    def put(self, key: str, value) -> None:
        self.out[key] = _f32(value)

    def conv(self, dst: str, src_path, rank: int = 1,
             bias: bool | None = None) -> None:
        """Dense leaf -> ConvNd 1x1 weight [out, in, 1(,1)] (+ bias)."""
        leaf = self.node(src_path)
        w = _f32(leaf["kernel"]).T  # [out, in]
        self.put(dst + ".weight", w.reshape(w.shape + (1,) * rank))
        if bias is None:
            bias = "bias" in leaf
        if bias:
            self.put(dst + ".bias", leaf["bias"])

    def linear(self, dst: str, src_path, bias: bool | None = None) -> None:
        leaf = self.node(src_path)
        self.put(dst + ".weight", _f32(leaf["kernel"]).T)
        if bias is None:
            bias = "bias" in leaf
        if bias:
            self.put(dst + ".bias", leaf["bias"])

    def bn(self, dst: str, params_path, stats_path=None) -> None:
        p = self.node(params_path)
        s = self.node(stats_path or params_path, stats=True)
        self.put(dst + ".weight", p["scale"])
        self.put(dst + ".bias", p["bias"])
        self.put(dst + ".running_mean", s["mean"])
        self.put(dst + ".running_var", s["var"])
        self.out[dst + ".num_batches_tracked"] = np.asarray(0, np.int64)

    def densebn(self, dst_conv: str, dst_bn: str | None, src_path,
                rank: int = 1, linear: bool = False) -> None:
        """DenseBN module -> torch conv/linear (+ BN)."""
        if linear:
            self.linear(dst_conv, src_path + ["Dense_0"])
        else:
            self.conv(dst_conv, src_path + ["Dense_0"], rank)
        if dst_bn is not None:
            self.bn(dst_bn, src_path + ["BatchNorm_0"])

    def unit(self, fn, *args, **kwargs) -> None:
        try:
            fn(*args, **kwargs)
        except KeyError as e:
            self.missing.append(str(e.args[0]))

    def point_head(self, dst: str, src: str) -> None:
        """4-layer per-point head (conv1-3 + BN + conv4); bias presence
        follows the flax layers (they mirror the reference exactly)."""
        for j in range(3):
            self.unit(self.densebn, f"{dst}.conv{j + 1}", f"{dst}.bn{j + 1}",
                      [src, f"DenseBN_{j}"])
        self.unit(self.conv, f"{dst}.conv4", [src, "Dense_0"])

    def density_head(self, dst: str, src: str, pergroup: float) -> None:
        self.unit(self.densebn, f"{dst}.conv1", f"{dst}.bn1",
                  [src, "DenseBN_0"])
        self.unit(self.densebn, f"{dst}.mlp1.fc.0", f"{dst}.mlp1.fc.1",
                  [src, "DenseBN_1"], linear=True)
        self.unit(self.densebn, f"{dst}.mlp2.fc.0", f"{dst}.mlp2.fc.1",
                  [src, "DenseBN_2"], linear=True)
        self.unit(self.linear, f"{dst}.mlp3", [src, "Dense_0"])
        # Frozen expectation bins (`PointDA/Models.py:267-270`); bin count
        # comes from the logits layer's output width.
        num_cls = int(self.node([src, "Dense_0"])["kernel"].shape[1])
        self.put(f"{dst}.fc2.weight",
                 (pergroup * np.arange(num_cls, dtype=np.float32))[None, :])

    # -- finishing ----------------------------------------------------------
    def finish(self, strict: bool = True) -> dict[str, np.ndarray]:
        if self.missing:
            msg = (f"{self.model_name} variables lack parameters the "
                   "reference model requires (was the model initialised "
                   "with all heads?):\n  " + "\n  ".join(sorted(self.missing)))
            if strict:
                raise CheckpointMismatchError(msg)
            warnings.warn(msg, stacklevel=3)
        return self.out


def save_torch_checkpoint(state_dict: dict[str, np.ndarray], path: str) -> None:
    """Write an exported state_dict as a reference-loadable `model.pt`."""
    import torch

    # np.array copies: torch.from_numpy on a read-only view (e.g. a
    # transposed jax export) trips torch's non-writable-tensor warning.
    torch.save({k: torch.from_numpy(np.array(v))
                for k, v in state_dict.items()}, path)


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _transform_net(e: _Exporter, dst: str, src: str) -> None:
    """flax `TransformNet` -> reference `transform_net`
    (`PointDA/model_utils.py:89-127`); convs are 2-D (the reference runs
    them on [B, C, N, k] / [B, C, N, 1])."""
    for j in range(3):
        e.unit(e.densebn, f"{dst}.conv2d{j + 1}.conv.0",
               f"{dst}.conv2d{j + 1}.conv.1", [src, f"DenseBN_{j}"], rank=2)
    e.unit(e.densebn, f"{dst}.fc1.fc.0", f"{dst}.fc1.fc.1",
           [src, "DenseBN_3"], linear=True)
    e.unit(e.densebn, f"{dst}.fc2.fc.0", f"{dst}.fc2.fc.1",
           [src, "DenseBN_4"], linear=True)
    e.unit(e.linear, f"{dst}.fc3", [src, "Dense_0"])


def _classifier(e: _Exporter, dst: str, src: str) -> None:
    e.unit(e.densebn, f"{dst}.mlp1.fc.0", f"{dst}.mlp1.fc.1",
           [src, "DenseBN_0"], linear=True)
    e.unit(e.densebn, f"{dst}.mlp2.fc.0", f"{dst}.mlp2.fc.1",
           [src, "DenseBN_1"], linear=True)
    e.unit(e.linear, f"{dst}.mlp3", [src, "Dense_0"])


# ---------------------------------------------------------------------------
# PointDA DGCNN (`PointDA/Models.py:82-162`)
# ---------------------------------------------------------------------------


def export_dgcnn(variables: dict, pergroup: float = 2.0,
                 strict: bool = True) -> dict:
    """flax DGCNN variables -> reference `DGCNN` state_dict.

    The reference model instantiates every head unconditionally, so a
    strict torch `load_state_dict` needs variables from a model
    initialised with heads ("defrec", "normal", "scan", "density");
    `strict=False` exports whatever heads are present (torch side must
    then load with `strict=False`).
    """
    e = _Exporter(variables, "DGCNN")

    _transform_net(e, "input_transform_net", "TransformNet_0")

    # EdgeConv stages: reassemble the concat weight [W_d | W_c].
    def edge_stage(i: int, dst: str) -> None:
        blk = _edge_block_name(e.params, i)
        wd = _f32(e.node([blk, "w_diff"])["kernel"]).T    # [out, cin]
        wc = _f32(e.node([blk, "w_center"])["kernel"]).T
        w = np.concatenate([wd, wc], axis=1)              # [out, 2*cin]
        e.put(f"{dst}.conv.0.weight", w.reshape(w.shape + (1, 1)))
        if "BatchNorm_0" in e.params[blk]:  # direct EdgeConv
            e.bn(f"{dst}.conv.1", [blk, "BatchNorm_0"])
        else:  # EdgeConvM: scale/bias at block level. Read ALL four
            # sources before writing anything (same atomicity contract
            # as bn()/torch_import.set_bn): a partial strict=False
            # export must never pair trained affine params with
            # torch-init running stats.
            p, s = e.node([blk]), e.node([blk], stats=True)
            scale, bias = p["scale"], p["bias"]
            mean, var = s["mean"], s["var"]
            e.put(f"{dst}.conv.1.weight", scale)
            e.put(f"{dst}.conv.1.bias", bias)
            e.put(f"{dst}.conv.1.running_mean", mean)
            e.put(f"{dst}.conv.1.running_var", var)
            e.out[f"{dst}.conv.1.num_batches_tracked"] = np.asarray(0, np.int64)

    for i, dst in enumerate(["conv1", "conv2", "conv3", "conv4"]):
        e.unit(edge_stage, i, dst)

    e.unit(e.conv, "conv5", ["DenseBN_0", "Dense_0"])
    e.unit(e.bn, "bn5", ["DenseBN_0", "BatchNorm_0"])

    _classifier(e, "C", "Classifier_0")

    for dst, src in (("DefRec", "DefRec"), ("Norm_pred", "NormPred"),
                     ("Rec_scan", "RecScan")):
        if e.has(src):
            e.point_head(dst, src)
        else:
            e.missing.append(src)
    if e.has("DensityCls"):
        e.density_head("Density_cls", "DensityCls", pergroup)
    else:
        e.missing.append("DensityCls")

    return e.finish(strict)


# ---------------------------------------------------------------------------
# PointDA PointNet (`PointDA/Models.py:26-79`)
# ---------------------------------------------------------------------------


def export_pointnet(variables: dict, strict: bool = True) -> dict:
    e = _Exporter(variables, "PointNet")

    _transform_net(e, "trans_net1", "TransformNet_0")
    _transform_net(e, "trans_net2", "trans_net2")

    for j, dst in enumerate(["conv1", "conv2", "conv3", "conv4", "conv5"]):
        e.unit(e.densebn, f"{dst}.conv.0", f"{dst}.conv.1",
               [f"DenseBN_{j}"], rank=2)

    _classifier(e, "C", "Classifier_0")

    if e.has("DefRec"):
        e.point_head("DefRec", "DefRec")
    else:
        e.missing.append("DefRec")

    return e.finish(strict)


# ---------------------------------------------------------------------------
# PointDA PointTransformer (`PointDA/Models.py:370-531`)
# ---------------------------------------------------------------------------


def _group_encoder(e: _Exporter, dst: str, src: str) -> None:
    """GroupEncoder -> reference `Encoder` (`model_utils.py:292-336`);
    the sum-of-Dense pairs reassemble into the concat convs, cat order
    [global(256) | h(256)]."""
    e.unit(e.densebn, f"{dst}.first_conv.0", f"{dst}.first_conv.1",
           [src, "DenseBN_0"])
    e.unit(e.conv, f"{dst}.first_conv.3", [src, "Dense_0"])
    for stage, bn, d_g, d_h, d_out in (
        ("add_conv1", "BatchNorm_0", "Dense_1", "Dense_2", "Dense_3"),
        ("second_conv", "BatchNorm_1", "Dense_4", "Dense_5", "Dense_6"),
    ):
        def one(stage=stage, bn=bn, d_g=d_g, d_h=d_h, d_out=d_out):
            g = _f32(e.node([src, d_g])["kernel"]).T   # [512, 256]
            h = _f32(e.node([src, d_h])["kernel"]).T   # [512, 256]
            w = np.concatenate([g, h], axis=1)         # [512, 512]
            e.put(f"{dst}.{stage}.0.weight", w.reshape(w.shape + (1,)))
            e.put(f"{dst}.{stage}.0.bias", e.node([src, d_g])["bias"])
            e.bn(f"{dst}.{stage}.1", [src, bn])
            e.conv(f"{dst}.{stage}.3", [src, d_out])

        e.unit(one)


def export_point_transformer(variables: dict,
                             strict: bool = False) -> dict:
    """flax `PointTransformer` -> reference state_dict (BACKBONE + cls
    head). The reference's DefRec branch is a CUDA propagation pyramid
    (`Models.py:489-531`, pointnet2_ops + KNN_CUDA) that our redesigned
    3-NN propagation deliberately replaced — those modules are NOT
    representable, so the torch side must `load_state_dict(strict=False)`
    (exactly how the reference itself loads pretrained transformers,
    `Models.py:458`). flax per-head q/k/v fuse back into the qkv weight;
    the reference's qkv is bias-free (`model_utils.py:227`), so nonzero
    flax qkv biases (possible after native training) are dropped with a
    warning.
    """
    e = _Exporter(variables, "PointTransformer")

    _group_encoder(e, "encoder", "GroupEncoder_0")
    e.unit(e.linear, "reduce_dim", ["reduce_dim"])
    e.unit(lambda: e.put("cls_token", e.node(["cls_token"])))
    e.unit(lambda: e.put("cls_pos", e.node(["cls_pos"])))
    e.unit(e.linear, "pos_embed.0", ["pos_embed_0"])
    e.unit(e.linear, "pos_embed.2", ["pos_embed_1"])

    def ln(dst, src_path):
        p = e.node(src_path)
        e.put(dst + ".weight", p["scale"])
        e.put(dst + ".bias", p["bias"])

    depth = sum(1 for k in e.params if k.startswith("block"))
    for i in range(depth):
        src = f"block{i}"
        dst = f"blocks.blocks.{i}"

        def block(src=src, dst=dst):
            ln(f"{dst}.norm1", [src, "LayerNorm_0"])
            ln(f"{dst}.norm2", [src, "LayerNorm_1"])
            mha = e.node([src, "MultiHeadDotProductAttention_0"])
            ws, bs = [], []
            for nm in ("query", "key", "value"):
                k_ = _f32(mha[nm]["kernel"])           # [D, H, Dh]
                D = k_.shape[0]
                ws.append(k_.reshape(D, D).T)          # [D, D] torch layout
                bs.append(_f32(mha[nm]["bias"]).reshape(-1))
            e.put(f"{dst}.attn.qkv.weight", np.concatenate(ws, axis=0))
            bmax = max(float(np.abs(b).max()) for b in bs)
            if bmax > 1e-6:
                warnings.warn(
                    f"{e.model_name}.{dst}: flax qkv biases (max {bmax:.2e}) "
                    "dropped — the reference qkv is bias-free", stacklevel=4)
            out = mha["out"]
            ko = _f32(out["kernel"])                   # [H, Dh, D]
            D = ko.shape[-1]
            e.put(f"{dst}.attn.proj.weight", ko.reshape(D, D).T)
            e.put(f"{dst}.attn.proj.bias", out["bias"])
            e.linear(f"{dst}.mlp.fc1", [src, "Dense_0"])
            e.linear(f"{dst}.mlp.fc2", [src, "Dense_1"])

        e.unit(block)

    e.unit(ln, "norm", ["norm"])
    e.unit(e.linear, "cls_head_finetune.0", ["cls_head_0"])
    e.unit(e.linear, "cls_head_finetune.3", ["cls_head_1"])

    return e.finish(strict)


# ---------------------------------------------------------------------------
# Hengshuang family (`hengshuang_transformer/hengshuang_model.py:1-211`)
# ---------------------------------------------------------------------------


def _vector_attention_out(e: _Exporter, dst: str, src_path) -> None:
    """VectorAttention -> reference `TransformerBlock`
    (`transformer.py:7-44`); inverse of the importer's Dense ordering."""
    e.linear(f"{dst}.fc1", src_path + ["Dense_0"])
    for j, nm in enumerate(("w_qs", "w_ks", "w_vs")):
        e.linear(f"{dst}.{nm}", src_path + [f"Dense_{j + 1}"])
    e.linear(f"{dst}.fc_delta.2", src_path + ["Dense_4"])
    e.linear(f"{dst}.fc_delta.0", src_path + ["Dense_5"])
    e.linear(f"{dst}.fc_gamma.2", src_path + ["Dense_6"])
    e.linear(f"{dst}.fc_gamma.0", src_path + ["Dense_7"])
    e.linear(f"{dst}.fc2", src_path + ["Dense_8"])


def export_hengshuang(variables: dict, nblocks: int = 4,
                      strict: bool = True) -> dict:
    """flax Hengshuang models -> reference state_dicts — FULLY
    strict-loadable (every reference module has an exact flax
    counterpart): `HengshuangTransformer` -> `PointTransformerDef`
    (`hengshuang_model.py:140-206`: backbone + fc2/transformer2/
    transition_ups/transformers decoder + cls_head_finetune + DefRec),
    `HengshuangSeg` -> `PointTransformerSeg` (`:99-139`: same decoder +
    fc3). The variant is inferred from the flax parameter tree."""
    e = _Exporter(variables, "Hengshuang")

    bb = "Backbone_0"
    e.unit(e.linear, "backbone.fc1.2", [bb, "Dense_0"])  # outer Linear
    e.unit(e.linear, "backbone.fc1.0", [bb, "Dense_1"])  # inner Linear
    e.unit(_vector_attention_out, e, "backbone.transformer1",
           [bb, "VectorAttention_0"])
    for i in range(nblocks):
        for j in range(2):
            e.unit(e.densebn,
                   f"backbone.transition_downs.{i}.sa.mlp_convs.{j}",
                   f"backbone.transition_downs.{i}.sa.mlp_bns.{j}",
                   [bb, f"TransitionDown_{i}", f"DenseBN_{j}"], rank=2)
        e.unit(_vector_attention_out, e, f"backbone.transformers.{i}",
               [bb, f"VectorAttention_{i + 1}"])

    if "Dense_0" in e.params:  # cls head (Def variant, `:168-174`)
        e.unit(e.linear, "cls_head_finetune.0", ["Dense_0"])
        e.unit(e.linear, "cls_head_finetune.2", ["Dense_1"])
        e.unit(e.linear, "cls_head_finetune.4", ["Dense_2"])
    if "seg_fc1" in e.params:  # fc3 seg head (`:120-126`)
        e.unit(e.linear, "fc3.0", ["seg_fc1"])
        e.unit(e.linear, "fc3.2", ["seg_fc2"])
        e.unit(e.linear, "fc3.4", ["seg_out"])

    if "UpDecoder_0" in e.params:
        ud = "UpDecoder_0"
        e.unit(e.linear, "fc2.0", [ud, "Dense_0"])
        e.unit(e.linear, "fc2.2", [ud, "Dense_1"])
        e.unit(e.linear, "fc2.4", [ud, "Dense_2"])
        e.unit(_vector_attention_out, e, "transformer2",
               [ud, "VectorAttention_0"])
        for j in range(nblocks):
            e.unit(e.densebn, f"transition_ups.{j}.fc1.0",
                   f"transition_ups.{j}.fc1.2",
                   [ud, f"TransitionUp_{j}", "DenseBN_0"], linear=True)
            e.unit(e.densebn, f"transition_ups.{j}.fc2.0",
                   f"transition_ups.{j}.fc2.2",
                   [ud, f"TransitionUp_{j}", "DenseBN_1"], linear=True)
            e.unit(_vector_attention_out, e, f"transformers.{j}",
                   [ud, f"VectorAttention_{j + 1}"])
    else:
        e.missing.append("UpDecoder_0 (init the model with the defrec/seg "
                         "head to materialise the decoder)")

    if "Dense_0" in e.params:
        # Def variant only: `PointTransformerSeg` has NO DefRec module —
        # exporting one would make its strict load fail on unexpected keys.
        if e.has("DefRec"):
            e.point_head("DefRec", "DefRec")
        else:
            e.missing.append("DefRec")

    return e.finish(strict)


# ---------------------------------------------------------------------------
# PointSegDA DGCNN_DefRec (`PointSegDA/Models.py:197-386`)
# ---------------------------------------------------------------------------


def export_dgcnn_seg(variables: dict, pergroup: float = 5.0,
                     strict: bool = True) -> dict:
    e = _Exporter(variables, "DGCNN_DefRec")

    # transform net: conv+leakyrelu, no BN (`PointSegDA/Models.py:106-143`)
    tn = "SegTransformNet_0"
    for j in range(3):
        e.unit(e.conv, f"input_transform_net.conv2d{j + 1}.conv.0",
               [tn, f"Dense_{j}"], rank=2)
    e.unit(e.linear, "input_transform_net.fc1.fc.0", [tn, "Dense_3"])
    e.unit(e.linear, "input_transform_net.fc2.fc.0", [tn, "Dense_4"])
    e.unit(e.linear, "input_transform_net.fc3", [tn, "Dense_5"])

    # shared_layers: the decomposed linear edge blocks back to conv pairs.
    def put_conv2d(dst: str, w: np.ndarray, b: np.ndarray) -> None:
        e.put(dst + ".weight", w.reshape(w.shape + (1, 1)))
        e.put(dst + ".bias", b)

    def double_block(blk: str, conv_a: str, conv_b: str) -> None:
        d0 = _f32(e.node([blk, "w_diff0"])["kernel"]).T    # [64, cin]
        d1 = _f32(e.node([blk, "w_diff1"])["kernel"]).T    # [64, 64]
        c0n = e.node([blk, "w_center0"])
        c1n = e.node([blk, "w_center1"])
        c0, b0 = _f32(c0n["kernel"]).T, _f32(c0n["bias"])
        c1, b1 = _f32(c1n["kernel"]).T, _f32(c1n["bias"])
        # V=d1, W_d=d0, W_c solves d1 @ W_c = c1 @ c0 (see module doc).
        target = c1 @ c0
        wc = np.linalg.pinv(d1.astype(np.float64)) @ target.astype(np.float64)
        wc = wc.astype(np.float32)
        denom = float(np.linalg.norm(target)) or 1.0
        resid = float(np.linalg.norm(d1 @ wc - target)) / denom
        if resid > _SOLVE_RTOL:
            warnings.warn(
                f"{e.model_name}.{conv_a}: second-stage diff map is "
                f"rank-deficient; export residual {resid:.2e} — the torch "
                "model will only approximate this block", stacklevel=4)
        put_conv2d(conv_a, np.concatenate([d0, wc], axis=1),
                   np.zeros(d1.shape[0], np.float32))
        put_conv2d(conv_b, d1, c1 @ b0 + b1)

    def single_block(blk: str, conv_a: str) -> None:
        d0 = _f32(e.node([blk, "w_diff0"])["kernel"]).T
        c0n = e.node([blk, "w_center0"])
        put_conv2d(conv_a, np.concatenate(
            [d0, _f32(c0n["kernel"]).T], axis=1), _f32(c0n["bias"]))

    e.unit(double_block, "LinearEdgeBlock_0", "shared_layers.conv1",
           "shared_layers.conv2")
    e.unit(double_block, "LinearEdgeBlock_1", "shared_layers.conv3",
           "shared_layers.conv4")
    e.unit(single_block, "LinearEdgeBlock_2", "shared_layers.conv5")
    e.unit(e.conv, "shared_layers.conv6", ["Dense_0"])

    for dst, src in (("seg", "seg"), ("DefRec", "DefRec"),
                     ("Norm_pred", "NormPred")):
        if e.has(src):
            e.point_head(dst, src)
        else:
            e.missing.append(src)
    if e.has("DensityCls"):
        e.density_head("Density_cls", "DensityCls", pergroup)
    else:
        e.missing.append("DensityCls")

    return e.finish(strict)
