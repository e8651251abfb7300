"""Import reference PyTorch checkpoints into mlsp_tpu models.

Loads a `torch.save(model.state_dict())` checkpoint produced by the
reference trainers (`utils/log.py:31-41` saves `model.pt`) and maps it
onto the flax DGCNN parameter tree, so users can bring trained
reference weights straight onto TPU.

Layout translations:
  * Conv1d/Conv2d 1x1 weights [out, in, 1(,1)]  ->  Dense kernel [in, out]
  * Linear weights [out, in]                    ->  Dense kernel [in, out]
  * EdgeConv convs consume concat(x_j - x_i, x_i) in torch; our
    decomposed EdgeConv splits W into w_diff = W[:, :C] and
    w_center = W[:, C:] (see models/dgcnn.py::EdgeConv).
  * BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats.
  * Density head's frozen expectation layer (fc2, weights pergroup*i,
    `PointDA/Models.py:267-270`) is analytic here — validated, not
    imported.

DataParallel's "module." prefix is stripped automatically.
"""

from __future__ import annotations

from typing import Any

import numpy as np


def _np(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
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


def import_dgcnn(sd: dict, variables: dict, pergroup: float = 2.0) -> dict:
    """Map a reference DGCNN state_dict onto flax variables.

    Args:
      sd: torch state dict (keys per `PointDA/Models.py:82-105`).
      variables: flax {"params", "batch_stats"} from `DGCNN.init` with
        heads ("defrec", "normal", "scan", "density").

    Returns:
      new variables dict; raises KeyError on missing source keys.
    """
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    bstats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])

    def set_dense(dst_p, kernel, bias=None):
        node = params
        for k in dst_p[:-1]:
            node = node[k]
        leaf = node[dst_p[-1]]
        assert leaf["kernel"].shape == kernel.shape, (
            dst_p, leaf["kernel"].shape, kernel.shape)
        leaf["kernel"] = kernel.astype(np.float32)
        # Only place a bias where the flax layer has one — reference
        # layers are bias-free in several dgcnn positions.
        if bias is not None and "bias" in leaf:
            leaf["bias"] = _np(bias)

    def set_bn(dst_params_path, dst_stats_path, src_prefix):
        node = params
        for k in dst_params_path:
            node = node[k]
        node["scale"] = _np(sd[f"{src_prefix}.weight"])
        node["bias"] = _np(sd[f"{src_prefix}.bias"])
        snode = bstats
        for k in dst_stats_path:
            snode = snode[k]
        snode["mean"] = _np(sd[f"{src_prefix}.running_mean"])
        snode["var"] = _np(sd[f"{src_prefix}.running_var"])

    def densebn(dst, src_conv, src_bn, linear=False):
        """Map conv/linear + BN into a DenseBN block."""
        w = _linear_kernel(sd[src_conv + ".weight"]) if linear else _conv_kernel(
            sd[src_conv + ".weight"])
        set_dense(dst + ["Dense_0"], w, sd.get(src_conv + ".bias"))
        set_bn(dst + ["BatchNorm_0"], dst + ["BatchNorm_0"], src_bn)

    # ---- input transform net (transform_net(args, 6, 3)) ----
    tn = ["TransformNet_0"]
    densebn(tn + ["DenseBN_0"], "input_transform_net.conv2d1.conv.0",
            "input_transform_net.conv2d1.conv.1")
    densebn(tn + ["DenseBN_1"], "input_transform_net.conv2d2.conv.0",
            "input_transform_net.conv2d2.conv.1")
    densebn(tn + ["DenseBN_2"], "input_transform_net.conv2d3.conv.0",
            "input_transform_net.conv2d3.conv.1")
    densebn(tn + ["DenseBN_3"], "input_transform_net.fc1.fc.0",
            "input_transform_net.fc1.fc.1", linear=True)
    densebn(tn + ["DenseBN_4"], "input_transform_net.fc2.fc.0",
            "input_transform_net.fc2.fc.1", linear=True)
    set_dense(tn + ["Dense_0"],
              _linear_kernel(sd["input_transform_net.fc3.weight"]),
              sd["input_transform_net.fc3.bias"])

    # ---- EdgeConv stages: split concat-weights into diff/center ----
    for i, (src, cin) in enumerate(
        [("conv1", 3), ("conv2", 64), ("conv3", 64), ("conv4", 128)]
    ):
        w = _np(sd[f"{src}.conv.0.weight"])  # [out, 2*cin, 1, 1]
        w = w.reshape(w.shape[0], w.shape[1])
        blk = _edge_block_name(params, i)
        set_dense([blk, "w_diff"], w[:, :cin].T)
        set_dense([blk, "w_center"], w[:, cin:].T)
        if "BatchNorm_0" in params[blk]:  # direct EdgeConv
            set_bn([blk, "BatchNorm_0"], [blk, "BatchNorm_0"], f"{src}.conv.1")
        else:  # EdgeConvM: scale/bias at block level
            params[blk]["scale"] = _np(sd[f"{src}.conv.1.weight"])
            params[blk]["bias"] = _np(sd[f"{src}.conv.1.bias"])
            bstats[blk]["mean"] = _np(sd[f"{src}.conv.1.running_mean"])
            bstats[blk]["var"] = _np(sd[f"{src}.conv.1.running_var"])

    # ---- conv5 + bn5 (global feature) ----
    densebn(["DenseBN_0"], "conv5", "bn5")

    # ---- classifier ----
    c = ["Classifier_0"]
    densebn(c + ["DenseBN_0"], "C.mlp1.fc.0", "C.mlp1.fc.1", linear=True)
    densebn(c + ["DenseBN_1"], "C.mlp2.fc.0", "C.mlp2.fc.1", linear=True)
    set_dense(c + ["Dense_0"], _linear_kernel(sd["C.mlp3.weight"]),
              sd["C.mlp3.bias"])

    # ---- per-point heads ----
    for dst, src in (("DefRec", "DefRec"), ("NormPred", "Norm_pred"),
                     ("RecScan", "Rec_scan")):
        for j in range(3):
            densebn([dst, f"DenseBN_{j}"], f"{src}.conv{j+1}", f"{src}.bn{j+1}")
        set_dense([dst, "Dense_0"], _conv_kernel(sd[f"{src}.conv4.weight"]))

    # ---- density head ----
    d = ["DensityCls"]
    densebn(d + ["DenseBN_0"], "Density_cls.conv1", "Density_cls.bn1")
    densebn(d + ["DenseBN_1"], "Density_cls.mlp1.fc.0", "Density_cls.mlp1.fc.1",
            linear=True)
    densebn(d + ["DenseBN_2"], "Density_cls.mlp2.fc.0", "Density_cls.mlp2.fc.1",
            linear=True)
    set_dense(d + ["Dense_0"], _linear_kernel(sd["Density_cls.mlp3.weight"]),
              sd["Density_cls.mlp3.bias"])
    # Frozen expectation layer: our DensityHead computes the expectation
    # analytically with bins model.pergroup * i, so the checkpoint's bin
    # width MUST match the pergroup the flax model was built with.
    if "Density_cls.fc2.weight" in sd:
        w = _np(sd["Density_cls.fc2.weight"]).reshape(-1)
        ckpt_pergroup = float(w[1] - w[0]) if len(w) > 1 else pergroup
        want = ckpt_pergroup * np.arange(len(w))
        if not np.allclose(w, want, atol=1e-4):
            raise ValueError("Density fc2 weights are not linear pergroup*i bins")
        if abs(ckpt_pergroup - pergroup) > 1e-4:
            raise ValueError(
                f"checkpoint density bin width {ckpt_pergroup} != model "
                f"pergroup {pergroup}; rebuild DGCNN(pergroup={ckpt_pergroup})"
            )

    return {"params": params, "batch_stats": bstats}


def _edge_block_name(params: dict, i: int) -> str:
    for prefix in ("EdgeConvM_", "EdgeConv_"):
        if f"{prefix}{i}" in params:
            return f"{prefix}{i}"
    raise KeyError(f"no EdgeConv block {i} in params")


def load_reference_dgcnn(path: str, variables: dict, pergroup: float = 2.0) -> dict:
    """Convenience: torch checkpoint file -> flax variables."""
    return import_dgcnn(load_torch_state_dict(path), variables, pergroup)
