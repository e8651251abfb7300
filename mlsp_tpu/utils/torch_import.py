"""Import reference PyTorch checkpoints into mlsp_tpu models.

Loads a `torch.save(model.state_dict())` checkpoint produced by the
reference trainers (`utils/log.py:31-41` saves `model.pt`) and maps it
onto the flax parameter trees, so users can bring trained reference
weights straight onto TPU. Covered models:

  * `import_dgcnn`     — PointDA `DGCNN` (`PointDA/Models.py:82-162`)
  * `import_pointnet`  — PointDA `PointNet` (`PointDA/Models.py:26-79`)
  * `import_dgcnn_seg` — PointSegDA `DGCNN_DefRec`
                         (`PointSegDA/Models.py:197-386`)

Layout translations:
  * Conv1d/Conv2d 1x1 weights [out, in, 1(,1)]  ->  Dense kernel [in, out]
  * Linear weights [out, in]                    ->  Dense kernel [in, out]
  * EdgeConv convs consume concat(x_j - x_i, x_i) in torch; our
    decomposed EdgeConv splits W into w_diff = W[:, :C] and
    w_center = W[:, C:] (see models/dgcnn.py::EdgeConv). The seg model's
    *linear* double-EdgeConv blocks additionally compose the second conv
    into both chains (see models/dgcnn_seg.py::LinearEdgeBlock).
  * BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats.
  * Density head's frozen expectation layer (fc2, weights pergroup*i,
    `PointDA/Models.py:267-270`) is analytic here — validated, not
    imported.

DataParallel's "module." prefix is stripped automatically.

Diagnostics (parity with `/root/reference/utils/checkpoint.py:16-134`):
a partial checkpoint raises `CheckpointMismatchError` listing EVERY
missing source key (grouped by module prefix, as the reference's
`get_missing_parameters_message` does); keys present in the checkpoint
but unused by the mapping produce a warning via
`get_unexpected_parameters_message`. Shape mismatches are collected and
reported together with both shapes.
"""

from __future__ import annotations

import warnings
from collections import defaultdict

import numpy as np


class CheckpointMismatchError(ValueError):
    """A torch checkpoint does not match the target model."""


# ---------------------------------------------------------------------------
# key-grouping diagnostics (reference utils/checkpoint.py:16-134 parity)
# ---------------------------------------------------------------------------


def _group_checkpoint_keys(keys):
    """Group keys by the prefix up to the final '.' (`checkpoint.py:84-102`)."""
    groups = defaultdict(list)
    for key in keys:
        pos = key.rfind(".")
        if pos >= 0:
            groups[key[:pos]].extend([key[pos + 1:]])
        else:
            groups[key].extend([])
    return groups


def _group_to_str(group) -> str:
    if not group:
        return ""
    if len(group) == 1:
        return "." + group[0]
    return ".{" + ", ".join(group) + "}"


def get_missing_parameters_message(keys) -> str:
    """Keys the model mapping needs but the checkpoint lacks
    (`utils/checkpoint.py:16-30`)."""
    groups = _group_checkpoint_keys(keys)
    msg = "Some model parameters or buffers are not found in the checkpoint:\n"
    msg += "\n".join("  " + k + _group_to_str(v) for k, v in groups.items())
    return msg


def get_unexpected_parameters_message(keys) -> str:
    """Checkpoint keys not used by the model mapping
    (`utils/checkpoint.py:33-47`)."""
    groups = _group_checkpoint_keys(keys)
    msg = "The checkpoint state_dict contains keys that are not used by the model:\n"
    msg += "\n".join("  " + k + _group_to_str(v) for k, v in groups.items())
    return msg


# ---------------------------------------------------------------------------
# low-level tensor translation
# ---------------------------------------------------------------------------


def _np(t) -> np.ndarray:
    # np.array (COPY, not asarray): `tensor.numpy()` is a view of the
    # torch parameter storage, and torch optimizers update parameters
    # in-place — an imported model must not change when the source torch
    # model trains on.
    return np.array(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                    np.float32)


def _conv_kernel(w) -> np.ndarray:
    """[out, in, 1(,1)] conv weight -> [in, out] dense kernel."""
    w = _np(w)
    return w.reshape(w.shape[0], w.shape[1]).T


def _linear_kernel(w) -> np.ndarray:
    return _np(w).T


def load_torch_state_dict(path: str) -> dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k.removeprefix("module."): v for k, v in sd.items()}


class _MissingKey(KeyError):
    def __init__(self, key: str):
        super().__init__(key)
        self.key = key


class _Mapper:
    """Tracks consumed source keys, missing keys, and shape mismatches
    while mapping a torch state_dict onto flax params/batch_stats."""

    def __init__(self, sd: dict, variables: dict, model_name: str):
        import jax

        self.sd = sd
        self.model_name = model_name
        self.consumed: set[str] = set()
        self.missing: list[str] = []
        self.bad_shapes: list[str] = []
        self.params = jax.tree_util.tree_map(np.asarray, variables["params"])
        self.bstats = jax.tree_util.tree_map(
            np.asarray, variables.get("batch_stats", {}))

    # -- source access ------------------------------------------------------
    def src(self, key: str):
        if key not in self.sd:
            raise _MissingKey(key)
        self.consumed.add(key)
        return self.sd[key]

    def src_opt(self, key: str):
        if key in self.sd:
            self.consumed.add(key)
            return self.sd[key]
        return None

    # -- guarded mapping units ---------------------------------------------
    def unit(self, fn, *args, **kwargs):
        """Run one mapping unit; record (don't raise) its missing keys."""
        try:
            fn(*args, **kwargs)
        except _MissingKey as e:
            self.missing.append(e.key)

    # -- destinations ---------------------------------------------------------
    def _node(self, tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    def set_dense(self, dst_path, kernel, bias=None):
        leaf = self._node(self.params, dst_path)
        if leaf["kernel"].shape != kernel.shape:
            self.bad_shapes.append(
                f"{'/'.join(dst_path)}: checkpoint {kernel.shape} "
                f"!= model {leaf['kernel'].shape}")
            return
        leaf["kernel"] = kernel.astype(np.float32)
        # Only place a bias where the flax layer has one — reference
        # layers are bias-free in several positions.
        if bias is not None and "bias" in leaf:
            leaf["bias"] = _np(bias)

    def set_bn(self, dst_params_path, dst_stats_path, src_prefix):
        # Read ALL four sources before writing anything: in strict=False
        # mode a partially-present BN layer must stay consistently at
        # init, never mix checkpoint affine params with init running
        # stats (silently wrong normalization).
        scale = _np(self.src(f"{src_prefix}.weight"))
        bias = _np(self.src(f"{src_prefix}.bias"))
        mean = _np(self.src(f"{src_prefix}.running_mean"))
        var = _np(self.src(f"{src_prefix}.running_var"))
        self.src_opt(f"{src_prefix}.num_batches_tracked")
        node = self._node(self.params, dst_params_path)
        node["scale"], node["bias"] = scale, bias
        snode = self._node(self.bstats, dst_stats_path)
        snode["mean"], snode["var"] = mean, var

    def densebn(self, dst, src_conv, src_bn=None, linear=False):
        """Map conv/linear (+ optional BN) into a DenseBN block."""
        w = (_linear_kernel(self.src(src_conv + ".weight")) if linear
             else _conv_kernel(self.src(src_conv + ".weight")))
        self.set_dense(dst + ["Dense_0"], w, self.src_opt(src_conv + ".bias"))
        if src_bn is not None:
            self.set_bn(dst + ["BatchNorm_0"], dst + ["BatchNorm_0"], src_bn)

    def point_head(self, dst: str, src: str, out_bias: bool = False):
        """4-layer per-point head (conv1-3 + BN + conv4)."""
        for j in range(3):
            self.unit(self.densebn, [dst, f"DenseBN_{j}"],
                      f"{src}.conv{j+1}", f"{src}.bn{j+1}")
        self.unit(lambda: self.set_dense(
            [dst, "Dense_0"], _conv_kernel(self.src(f"{src}.conv4.weight")),
            self.src_opt(f"{src}.conv4.bias") if out_bias else None))

    def density_head(self, dst: str, src: str, pergroup: float):
        self.unit(self.densebn, [dst, "DenseBN_0"], f"{src}.conv1", f"{src}.bn1")
        self.unit(self.densebn, [dst, "DenseBN_1"], f"{src}.mlp1.fc.0",
                  f"{src}.mlp1.fc.1", True)
        self.unit(self.densebn, [dst, "DenseBN_2"], f"{src}.mlp2.fc.0",
                  f"{src}.mlp2.fc.1", True)
        self.unit(lambda: self.set_dense(
            [dst, "Dense_0"], _linear_kernel(self.src(f"{src}.mlp3.weight")),
            self.src(f"{src}.mlp3.bias")))
        # Frozen expectation layer: our DensityHead computes the
        # expectation analytically with bins pergroup * i, so the
        # checkpoint's bin width MUST match the flax model's pergroup.
        w = self.src_opt(f"{src}.fc2.weight")
        if w is not None:
            w = _np(w).reshape(-1)
            ckpt_pergroup = float(w[1] - w[0]) if len(w) > 1 else pergroup
            want = ckpt_pergroup * np.arange(len(w))
            if not np.allclose(w, want, atol=1e-4):
                raise ValueError(
                    f"{src}.fc2 weights are not linear pergroup*i bins")
            if abs(ckpt_pergroup - pergroup) > 1e-4:
                raise ValueError(
                    f"checkpoint density bin width {ckpt_pergroup} != model "
                    f"pergroup {pergroup}; rebuild with pergroup={ckpt_pergroup}")

    # -- finishing -----------------------------------------------------------
    def finish(self, strict: bool = True) -> dict:
        problems = []
        if self.missing:
            problems.append(get_missing_parameters_message(sorted(self.missing)))
        if self.bad_shapes:
            problems.append(
                "Checkpoint tensors with mismatched shapes:\n  "
                + "\n  ".join(self.bad_shapes))
        if problems:
            msg = (f"checkpoint does not match {self.model_name}:\n"
                   + "\n".join(problems))
            if strict:
                raise CheckpointMismatchError(msg)
            # Non-strict still surfaces the report: silently keeping
            # randomly-initialized layers is the failure mode the
            # reference's diagnostics exist to prevent.
            warnings.warn(msg, stacklevel=3)
        unexpected = sorted(
            k for k in self.sd
            if k not in self.consumed and not k.endswith("num_batches_tracked"))
        if unexpected:
            warnings.warn(get_unexpected_parameters_message(unexpected),
                          stacklevel=3)
        return {"params": self.params, "batch_stats": self.bstats}


# ---------------------------------------------------------------------------
# PointDA DGCNN (`PointDA/Models.py:82-162`)
# ---------------------------------------------------------------------------


def import_dgcnn(sd: dict, variables: dict, pergroup: float = 2.0,
                 strict: bool = True) -> dict:
    """Map a reference DGCNN state_dict onto flax variables.

    Args:
      sd: torch state dict (keys per `PointDA/Models.py:82-105`).
      variables: flax {"params", "batch_stats"} from `DGCNN.init` with
        heads ("defrec", "normal", "scan", "density").
      strict: raise `CheckpointMismatchError` on missing keys / shape
        mismatches (otherwise map what's there and warn).

    Returns:
      new variables dict.
    """
    m = _Mapper(sd, variables, "DGCNN")

    # ---- input transform net (transform_net(args, 6, 3)) ----
    tn = ["TransformNet_0"]
    m.unit(m.densebn, tn + ["DenseBN_0"], "input_transform_net.conv2d1.conv.0",
           "input_transform_net.conv2d1.conv.1")
    m.unit(m.densebn, tn + ["DenseBN_1"], "input_transform_net.conv2d2.conv.0",
           "input_transform_net.conv2d2.conv.1")
    m.unit(m.densebn, tn + ["DenseBN_2"], "input_transform_net.conv2d3.conv.0",
           "input_transform_net.conv2d3.conv.1")
    m.unit(m.densebn, tn + ["DenseBN_3"], "input_transform_net.fc1.fc.0",
           "input_transform_net.fc1.fc.1", True)
    m.unit(m.densebn, tn + ["DenseBN_4"], "input_transform_net.fc2.fc.0",
           "input_transform_net.fc2.fc.1", True)
    m.unit(lambda: m.set_dense(
        tn + ["Dense_0"], _linear_kernel(m.src("input_transform_net.fc3.weight")),
        m.src("input_transform_net.fc3.bias")))

    # ---- EdgeConv stages: split concat-weights into diff/center ----
    def edge_stage(i, src, cin):
        w = _np(m.src(f"{src}.conv.0.weight"))  # [out, 2*cin, 1, 1]
        w = w.reshape(w.shape[0], w.shape[1])
        blk = _edge_block_name(m.params, i)
        m.set_dense([blk, "w_diff"], w[:, :cin].T)
        m.set_dense([blk, "w_center"], w[:, cin:].T)
        if "BatchNorm_0" in m.params[blk]:  # direct EdgeConv
            m.set_bn([blk, "BatchNorm_0"], [blk, "BatchNorm_0"], f"{src}.conv.1")
        else:  # EdgeConvM: scale/bias at block level (read-all-first,
            # same atomicity contract as set_bn)
            scale = _np(m.src(f"{src}.conv.1.weight"))
            bias = _np(m.src(f"{src}.conv.1.bias"))
            mean = _np(m.src(f"{src}.conv.1.running_mean"))
            var = _np(m.src(f"{src}.conv.1.running_var"))
            m.src_opt(f"{src}.conv.1.num_batches_tracked")
            m.params[blk]["scale"], m.params[blk]["bias"] = scale, bias
            m.bstats[blk]["mean"], m.bstats[blk]["var"] = mean, var

    for i, (src, cin) in enumerate(
        [("conv1", 3), ("conv2", 64), ("conv3", 64), ("conv4", 128)]
    ):
        m.unit(edge_stage, i, src, cin)

    # ---- conv5 + bn5 (global feature) ----
    m.unit(m.densebn, ["DenseBN_0"], "conv5", "bn5")

    # ---- classifier ----
    c = ["Classifier_0"]
    m.unit(m.densebn, c + ["DenseBN_0"], "C.mlp1.fc.0", "C.mlp1.fc.1", True)
    m.unit(m.densebn, c + ["DenseBN_1"], "C.mlp2.fc.0", "C.mlp2.fc.1", True)
    m.unit(lambda: m.set_dense(
        c + ["Dense_0"], _linear_kernel(m.src("C.mlp3.weight")),
        m.src("C.mlp3.bias")))

    # ---- per-point heads ----
    for dst, src in (("DefRec", "DefRec"), ("NormPred", "Norm_pred"),
                     ("RecScan", "Rec_scan")):
        if dst in m.params:
            m.point_head(dst, src)

    # ---- density head ----
    if "DensityCls" in m.params:
        m.density_head("DensityCls", "Density_cls", pergroup)

    return m.finish(strict)


def _edge_block_name(params: dict, i: int) -> str:
    for prefix in ("EdgeConvM_", "EdgeConv_"):
        if f"{prefix}{i}" in params:
            return f"{prefix}{i}"
    raise KeyError(f"no EdgeConv block {i} in params")


# ---------------------------------------------------------------------------
# PointDA PointNet (`PointDA/Models.py:26-79`)
# ---------------------------------------------------------------------------


def import_pointnet(sd: dict, variables: dict, strict: bool = True) -> dict:
    """Map a reference PointNet state_dict onto flax variables.

    Reference structure (`PointDA/Models.py:26-79`): trans_net1 (3x3),
    conv1/conv2 (64, 64), trans_net2 (64x64), conv3/conv4 (64, 128),
    conv5 (1024), classifier C, DefRec head. PointNet-mode conv_2d /
    fc_layer have bias=True and ReLU (`model_utils.py:44-86`).
    """
    m = _Mapper(sd, variables, "PointNet")

    def tnet(dst: str, src: str):
        m.unit(m.densebn, [dst, "DenseBN_0"], f"{src}.conv2d1.conv.0",
               f"{src}.conv2d1.conv.1")
        m.unit(m.densebn, [dst, "DenseBN_1"], f"{src}.conv2d2.conv.0",
               f"{src}.conv2d2.conv.1")
        m.unit(m.densebn, [dst, "DenseBN_2"], f"{src}.conv2d3.conv.0",
               f"{src}.conv2d3.conv.1")
        m.unit(m.densebn, [dst, "DenseBN_3"], f"{src}.fc1.fc.0",
               f"{src}.fc1.fc.1", True)
        m.unit(m.densebn, [dst, "DenseBN_4"], f"{src}.fc2.fc.0",
               f"{src}.fc2.fc.1", True)
        m.unit(lambda: m.set_dense(
            [dst, "Dense_0"], _linear_kernel(m.src(f"{src}.fc3.weight")),
            m.src(f"{src}.fc3.bias")))

    tnet("TransformNet_0", "trans_net1")
    tnet("trans_net2", "trans_net2")

    # conv1..conv4 -> DenseBN_0..3; conv5 -> DenseBN_4 (models/pointnet.py)
    for j, src in enumerate(["conv1", "conv2", "conv3", "conv4", "conv5"]):
        m.unit(m.densebn, [f"DenseBN_{j}"], f"{src}.conv.0", f"{src}.conv.1")

    c = ["Classifier_0"]
    m.unit(m.densebn, c + ["DenseBN_0"], "C.mlp1.fc.0", "C.mlp1.fc.1", True)
    m.unit(m.densebn, c + ["DenseBN_1"], "C.mlp2.fc.0", "C.mlp2.fc.1", True)
    m.unit(lambda: m.set_dense(
        c + ["Dense_0"], _linear_kernel(m.src("C.mlp3.weight")),
        m.src("C.mlp3.bias")))

    if "DefRec" in m.params:
        m.point_head("DefRec", "DefRec")

    return m.finish(strict)


# ---------------------------------------------------------------------------
# PointSegDA DGCNN_DefRec (`PointSegDA/Models.py:197-386`)
# ---------------------------------------------------------------------------


def import_dgcnn_seg(sd: dict, variables: dict, pergroup: float = 5.0,
                     strict: bool = True) -> dict:
    """Map a reference DGCNN_DefRec state_dict onto DGCNNSeg variables.

    The seg model's `shared_layers` applies *linear* conv pairs to edge
    features (`PointSegDA/Models.py:159-191`, no activation/BN between
    them); our `LinearEdgeBlock` decomposes that into separate diff /
    center chains (models/dgcnn_seg.py). For torch weights
    conv_a = [W_d | W_c] (+b_a) on edge features and conv_b = V (+b_b):

        edge value  = V (W_d (x_j - x_i) + W_c x_i + b_a) + b_b
        diff chain  : w_diff0 = W_d,       w_diff1 = V      (no biases)
        center chain: w_center0 = W_c + b_a, w_center1 = V + b_b

    so that u_max - u + w == max_j [.] exactly (constants commute with
    the per-channel max over j).
    """
    m = _Mapper(sd, variables, "DGCNN_DefRec")

    # ---- transform net (conv+leakyrelu, NO BN — PointSegDA/Models.py:106-143)
    tn = ["SegTransformNet_0"]
    m.unit(lambda: m.set_dense(tn + ["Dense_0"], _conv_kernel(
        m.src("input_transform_net.conv2d1.conv.0.weight"))))
    m.unit(lambda: m.set_dense(tn + ["Dense_1"], _conv_kernel(
        m.src("input_transform_net.conv2d2.conv.0.weight"))))
    m.unit(lambda: m.set_dense(tn + ["Dense_2"], _conv_kernel(
        m.src("input_transform_net.conv2d3.conv.0.weight"))))
    m.unit(lambda: m.set_dense(tn + ["Dense_3"], _linear_kernel(
        m.src("input_transform_net.fc1.fc.0.weight")),
        m.src("input_transform_net.fc1.fc.0.bias")))
    m.unit(lambda: m.set_dense(tn + ["Dense_4"], _linear_kernel(
        m.src("input_transform_net.fc2.fc.0.weight")),
        m.src("input_transform_net.fc2.fc.0.bias")))
    m.unit(lambda: m.set_dense(tn + ["Dense_5"], _linear_kernel(
        m.src("input_transform_net.fc3.weight")),
        m.src("input_transform_net.fc3.bias")))

    # ---- shared_layers: 3 linear edge blocks + conv6 ----
    def double_block(blk: str, conv_a: str, conv_b: str, cin: int):
        wa = _np(m.src(f"{conv_a}.weight"))
        wa = wa.reshape(wa.shape[0], wa.shape[1])  # [out, 2*cin]
        ba = m.src(f"{conv_a}.bias")
        wb = _np(m.src(f"{conv_b}.weight"))
        wb = wb.reshape(wb.shape[0], wb.shape[1])
        bb = m.src(f"{conv_b}.bias")
        m.set_dense([blk, "w_diff0"], wa[:, :cin].T)
        m.set_dense([blk, "w_center0"], wa[:, cin:].T, ba)
        m.set_dense([blk, "w_diff1"], wb.T)
        m.set_dense([blk, "w_center1"], wb.T, bb)

    def single_block(blk: str, conv_a: str, cin: int):
        wa = _np(m.src(f"{conv_a}.weight"))
        wa = wa.reshape(wa.shape[0], wa.shape[1])
        ba = m.src(f"{conv_a}.bias")
        m.set_dense([blk, "w_diff0"], wa[:, :cin].T)
        m.set_dense([blk, "w_center0"], wa[:, cin:].T, ba)

    m.unit(double_block, "LinearEdgeBlock_0", "shared_layers.conv1",
           "shared_layers.conv2", 3)
    m.unit(double_block, "LinearEdgeBlock_1", "shared_layers.conv3",
           "shared_layers.conv4", 64)
    m.unit(single_block, "LinearEdgeBlock_2", "shared_layers.conv5", 64)
    m.unit(lambda: m.set_dense(
        ["Dense_0"], _conv_kernel(m.src("shared_layers.conv6.weight")),
        m.src("shared_layers.conv6.bias")))

    # ---- heads ----
    if "seg" in m.params:
        m.point_head("seg", "seg", out_bias=True)
    if "DefRec" in m.params:
        m.point_head("DefRec", "DefRec", out_bias=True)
    if "NormPred" in m.params:
        m.point_head("NormPred", "Norm_pred")
    if "DensityCls" in m.params:
        m.density_head("DensityCls", "Density_cls", pergroup)

    return m.finish(strict)


# ---------------------------------------------------------------------------
# PointDA PointTransformer (`PointDA/Models.py:370-531`)
# ---------------------------------------------------------------------------


def _encoder_into_group_encoder(m: _Mapper, dst: str, src: str):
    """Reference `Encoder` (`model_utils.py:292-336`, with the hardcoded
    add_conv1 stage) -> `GroupEncoder`. The concat convs split into
    sum-of-Dense pairs; cat order is [global(256) | h(256)]."""

    def cols(name, sl):
        w = _np(m.src(name + ".weight"))
        return w.reshape(w.shape[0], w.shape[1])[:, sl].T

    g256, h256 = slice(0, 256), slice(256, 512)
    m.unit(m.densebn, [dst, "DenseBN_0"], f"{src}.first_conv.0",
           f"{src}.first_conv.1")
    m.unit(lambda: m.set_dense(
        [dst, "Dense_0"], _conv_kernel(m.src(f"{src}.first_conv.3.weight")),
        m.src(f"{src}.first_conv.3.bias")))
    for stage, bn, d_g, d_h, d_out in (
        ("add_conv1", "BatchNorm_0", "Dense_1", "Dense_2", "Dense_3"),
        ("second_conv", "BatchNorm_1", "Dense_4", "Dense_5", "Dense_6"),
    ):
        def one(stage=stage, bn=bn, d_g=d_g, d_h=d_h, d_out=d_out):
            m.set_dense([dst, d_g], cols(f"{src}.{stage}.0", g256),
                        m.src(f"{src}.{stage}.0.bias"))
            m.set_dense([dst, d_h], cols(f"{src}.{stage}.0", h256))
            m.set_bn([dst, bn], [dst, bn], f"{src}.{stage}.1")
            m.set_dense([dst, d_out],
                        _conv_kernel(m.src(f"{src}.{stage}.3.weight")),
                        m.src(f"{src}.{stage}.3.bias"))

        m.unit(one)


def import_point_transformer(sd: dict, variables: dict,
                             strict: bool = True) -> dict:
    """Map a reference `PointTransformer` state_dict (or a pretraining
    checkpoint's backbone after `strip_pretrain_prefixes`) onto flax
    variables from `models.transformer.PointTransformer.init`.

    Covers the backbone the reference's `load_model_from_ckpt`
    transfers (`Models.py:446-470`): group encoder, reduce_dim,
    cls_token/cls_pos, pos_embed, ViT blocks (fused qkv split into flax
    per-head projections; the reference uses qkv_bias=False, so missing
    qkv biases become zeros), final LayerNorm, plus cls_head_finetune
    when present (pretraining checkpoints lack the heads — use
    strict=False there, like the reference's strict=False load). The
    reference's CUDA DefRec pyramid (propagation_*/dgcnn_pro_*) is
    deliberately NOT mapped — our DefRec branch is the redesigned 3-NN
    propagation (those keys surface in the unexpected-keys report).
    """
    m = _Mapper(sd, variables, "PointTransformer")

    _encoder_into_group_encoder(m, "GroupEncoder_0", "encoder")
    m.unit(lambda: m.set_dense(
        ["reduce_dim"], _linear_kernel(m.src("reduce_dim.weight")),
        m.src("reduce_dim.bias")))

    def token(dst, src):
        t = _np(m.src(src))
        if m.params[dst].shape != t.shape:
            m.bad_shapes.append(
                f"{dst}: checkpoint {t.shape} != model {m.params[dst].shape}")
            return
        m.params[dst] = t

    m.unit(token, "cls_token", "cls_token")
    m.unit(token, "cls_pos", "cls_pos")
    m.unit(lambda: m.set_dense(
        ["pos_embed_0"], _linear_kernel(m.src("pos_embed.0.weight")),
        m.src("pos_embed.0.bias")))
    m.unit(lambda: m.set_dense(
        ["pos_embed_1"], _linear_kernel(m.src("pos_embed.2.weight")),
        m.src("pos_embed.2.bias")))

    def ln(dst_path, src):
        node = m._node(m.params, dst_path)
        node["scale"] = _np(m.src(src + ".weight"))
        node["bias"] = _np(m.src(src + ".bias"))

    depth = sum(1 for k in m.params if k.startswith("block"))
    for i in range(depth):
        src = f"blocks.blocks.{i}"
        dst = f"block{i}"

        def block(src=src, dst=dst):
            ln([dst, "LayerNorm_0"], f"{src}.norm1")
            ln([dst, "LayerNorm_1"], f"{src}.norm2")
            # fused qkv [3D, D] -> flax per-head q/k/v kernels [D, H, Dh]
            # (H inferred from the model's own kernel shape)
            W = _np(m.src(f"{src}.attn.qkv.weight"))
            D = W.shape[1]
            node = m._node(m.params, [dst, "MultiHeadDotProductAttention_0"])
            heads = node["query"]["kernel"].shape[1]
            dh = D // heads
            qkv_b = m.src_opt(f"{src}.attn.qkv.bias")
            for j, nm in enumerate(("query", "key", "value")):
                k_ = W[j * D:(j + 1) * D].T.reshape(D, heads, dh)
                if node[nm]["kernel"].shape != k_.shape:
                    m.bad_shapes.append(
                        f"{dst}/{nm}: checkpoint {k_.shape} != model "
                        f"{node[nm]['kernel'].shape}")
                    return
                node[nm]["kernel"] = k_.astype(np.float32)
                node[nm]["bias"] = (
                    _np(qkv_b)[j * D:(j + 1) * D].reshape(heads, dh)
                    if qkv_b is not None
                    else np.zeros((heads, dh), np.float32))  # qkv_bias=False
            Wp = _np(m.src(f"{src}.attn.proj.weight"))
            node["out"]["kernel"] = Wp.T.reshape(heads, dh, D).astype(np.float32)
            node["out"]["bias"] = _np(m.src(f"{src}.attn.proj.bias"))
            m.set_dense([dst, "Dense_0"],
                        _linear_kernel(m.src(f"{src}.mlp.fc1.weight")),
                        m.src(f"{src}.mlp.fc1.bias"))
            m.set_dense([dst, "Dense_1"],
                        _linear_kernel(m.src(f"{src}.mlp.fc2.weight")),
                        m.src(f"{src}.mlp.fc2.bias"))

        m.unit(block)

    m.unit(ln, ["norm"], "norm")
    m.unit(lambda: m.set_dense(
        ["cls_head_0"], _linear_kernel(m.src("cls_head_finetune.0.weight")),
        m.src("cls_head_finetune.0.bias")))
    m.unit(lambda: m.set_dense(
        ["cls_head_1"], _linear_kernel(m.src("cls_head_finetune.3.weight")),
        m.src("cls_head_finetune.3.bias")))

    return m.finish(strict)


# ---------------------------------------------------------------------------
# Hengshuang Point Transformer family
# (`PointDA/hengshuang_transformer/hengshuang_model.py:1-211`)
# ---------------------------------------------------------------------------


def _vector_attention(m: _Mapper, dst, src):
    """`TransformerBlock` (`transformer.py:7-44`) -> `VectorAttention`.

    Dense construction order (flax numbers by construction; in `f(g(x))`
    the OUTER module is constructed first): fc1, w_qs, w_ks, w_vs,
    fc_delta (outer, inner), fc_gamma (outer, inner), fc2."""
    m.set_dense(dst + ["Dense_0"], _linear_kernel(m.src(src + ".fc1.weight")),
                m.src(src + ".fc1.bias"))
    for j, nm in enumerate(("w_qs", "w_ks", "w_vs")):
        m.set_dense(dst + [f"Dense_{j + 1}"],
                    _linear_kernel(m.src(f"{src}.{nm}.weight")))
    m.set_dense(dst + ["Dense_4"],
                _linear_kernel(m.src(src + ".fc_delta.2.weight")),
                m.src(src + ".fc_delta.2.bias"))
    m.set_dense(dst + ["Dense_5"],
                _linear_kernel(m.src(src + ".fc_delta.0.weight")),
                m.src(src + ".fc_delta.0.bias"))
    m.set_dense(dst + ["Dense_6"],
                _linear_kernel(m.src(src + ".fc_gamma.2.weight")),
                m.src(src + ".fc_gamma.2.bias"))
    m.set_dense(dst + ["Dense_7"],
                _linear_kernel(m.src(src + ".fc_gamma.0.weight")),
                m.src(src + ".fc_gamma.0.bias"))
    m.set_dense(dst + ["Dense_8"], _linear_kernel(m.src(src + ".fc2.weight")),
                m.src(src + ".fc2.bias"))


def import_hengshuang(sd: dict, variables: dict, nblocks: int = 4,
                      strict: bool = True) -> dict:
    """Map a reference hengshuang state_dict onto flax variables.

    Handles `PointTransformerDef` (cls_head_finetune + decoder + DefRec,
    `hengshuang_model.py:140-206`) for `HengshuangTransformer`, and
    `PointTransformerSeg` (fc3 seg head, `:99-139`) for `HengshuangSeg`
    — the variant is inferred from the TARGET's parameter tree; keys the
    target lacks (e.g. no decoder when initialised without the defrec
    head) are skipped, unknown source keys are reported."""
    m = _Mapper(sd, variables, "Hengshuang")

    # ---- Backbone (`hengshuang_model.py:49-77`) ----
    bb = ["Backbone_0"]
    pre = "backbone."
    m.unit(lambda: m.set_dense(
        bb + ["Dense_0"], _linear_kernel(m.src(pre + "fc1.2.weight")),
        m.src(pre + "fc1.2.bias")))  # outer Linear(32,32)
    m.unit(lambda: m.set_dense(
        bb + ["Dense_1"], _linear_kernel(m.src(pre + "fc1.0.weight")),
        m.src(pre + "fc1.0.bias")))  # inner Linear(3,32)
    m.unit(_vector_attention, m, bb + ["VectorAttention_0"],
           pre + "transformer1")
    for i in range(nblocks):
        td = bb + [f"TransitionDown_{i}"]
        for j in range(2):
            m.unit(m.densebn, td + [f"DenseBN_{j}"],
                   f"{pre}transition_downs.{i}.sa.mlp_convs.{j}",
                   f"{pre}transition_downs.{i}.sa.mlp_bns.{j}")
        m.unit(_vector_attention, m, bb + [f"VectorAttention_{i + 1}"],
               f"{pre}transformers.{i}")

    # ---- classification head (Def variant `:168-174`) ----
    if "Dense_0" in m.params:
        for j, src in enumerate(("cls_head_finetune.0", "cls_head_finetune.2",
                                 "cls_head_finetune.4")):
            def one(j=j, src=src):
                m.set_dense([f"Dense_{j}"],
                            _linear_kernel(m.src(src + ".weight")),
                            m.src(src + ".bias"))

            m.unit(one)

    # ---- seg head (`:120-126`) ----
    if "seg_fc1" in m.params:
        for dst, src in (("seg_fc1", "fc3.0"), ("seg_fc2", "fc3.2"),
                         ("seg_out", "fc3.4")):
            def one(dst=dst, src=src):
                m.set_dense([dst], _linear_kernel(m.src(src + ".weight")),
                            m.src(src + ".bias"))

            m.unit(one)

    # ---- U-Net decoder (`:104-118,145-160`) ----
    if "UpDecoder_0" in m.params:
        ud = ["UpDecoder_0"]
        for j, src in enumerate(("fc2.0", "fc2.2", "fc2.4")):
            def one(j=j, src=src):
                m.set_dense(ud + [f"Dense_{j}"],
                            _linear_kernel(m.src(src + ".weight")),
                            m.src(src + ".bias"))

            m.unit(one)
        m.unit(_vector_attention, m, ud + ["VectorAttention_0"],
               "transformer2")
        for j in range(nblocks):
            tu = ud + [f"TransitionUp_{j}"]
            m.unit(m.densebn, tu + ["DenseBN_0"],
                   f"transition_ups.{j}.fc1.0", f"transition_ups.{j}.fc1.2",
                   True)
            m.unit(m.densebn, tu + ["DenseBN_1"],
                   f"transition_ups.{j}.fc2.0", f"transition_ups.{j}.fc2.2",
                   True)
            m.unit(_vector_attention, m, ud + [f"VectorAttention_{j + 1}"],
                   f"transformers.{j}")

    # ---- DefRec head (RegionReconstruction(32+512), `:176`) ----
    if "DefRec" in m.params and "DefRec.conv1.weight" in sd:
        m.point_head("DefRec", "DefRec")

    return m.finish(strict)


def load_reference_hengshuang(path: str, variables: dict,
                              nblocks: int = 4) -> dict:
    return import_hengshuang(load_torch_state_dict(path), variables, nblocks,
                             strict=False)


def strip_pretrain_prefixes(ckpt: dict) -> dict:
    """The reference's exact pretraining-checkpoint key surgery
    (`Models.py:447-455`): take ckpt['base_model'], drop 'module.',
    keep 'transformer_q.*' (except its cls_head) and 'base_model.*'
    stripped of their prefixes — every OTHER key is deleted (the
    reference loop dels unconditionally)."""
    base = {k.replace("module.", ""): v for k, v in ckpt["base_model"].items()}
    out = {}
    for k, v in base.items():
        if k.startswith("transformer_q") and not k.startswith(
                "transformer_q.cls_head"):
            out[k[len("transformer_q."):]] = v
        elif k.startswith("base_model"):
            out[k[len("base_model."):]] = v
    return out


def load_reference_point_transformer(path: str, variables: dict) -> dict:
    """Torch checkpoint file -> flax variables.

    Accepts either a plain `model.pt` state_dict or a Point-BERT-style
    pretraining checkpoint (`{'base_model': {...}}` with
    transformer_q/base_model prefixes) — the latter goes through the
    reference's prefix surgery and loads non-strict, reporting
    missing/unexpected keys exactly as `load_model_from_ckpt` does."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "base_model" in ckpt:
        return import_point_transformer(
            strip_pretrain_prefixes(ckpt), variables, strict=False)
    sd = {k.removeprefix("module."): v for k, v in ckpt.items()}
    return import_point_transformer(sd, variables, strict=False)


def load_reference_dgcnn(path: str, variables: dict, pergroup: float = 2.0) -> dict:
    """Convenience: torch checkpoint file -> flax variables."""
    return import_dgcnn(load_torch_state_dict(path), variables, pergroup)


def load_reference_pointnet(path: str, variables: dict) -> dict:
    return import_pointnet(load_torch_state_dict(path), variables)


def load_reference_dgcnn_seg(path: str, variables: dict,
                             pergroup: float = 5.0) -> dict:
    return import_dgcnn_seg(load_torch_state_dict(path), variables, pergroup)
