"""AOT serving bundles: the compiled eval program + weights, frozen.

The reference deploys by shipping its Python model code and a torch
`model.pt`. Here the serving surface can additionally be frozen into a
self-contained directory:

    bundle/
      eval_fn.stablehlo   jax.export artifact of the eval forward
      weights.ckpt        params + batch_stats (flax msgpack)
      meta.json           model/task/shape/platform metadata

Loading needs NO model class and no mlsp_tpu model code — the StableHLO
program carries the whole forward (kNN graphs, EdgeConvs, heads), and
the weights are passed as runtime ARGUMENTS (keeping the artifact a few
KB and clear of the remote compiler's baked-constant size limits). By
default the program is lowered for BOTH cpu and tpu, so one artifact
serves on either; the kNN build uses the XLA backend inside the bundle
(platform-portable — the Pallas kernels are chip-toolchain-specific).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

_FN_FILE = "eval_fn.stablehlo"
_WEIGHTS_FILE = "weights.ckpt"
_META_FILE = "meta.json"


def _build_eval_fn(model, task: str):
    heads = ("seg",) if task == "pointsegda" else ()

    def fn(params, bstats, x):
        out = model.apply({"params": params, "batch_stats": bstats}, x,
                          train=False, heads=heads)
        return out["seg" if task == "pointsegda" else "cls"]

    return fn


def save_serving_bundle(state, model, path: str, *, task: str = "pointda",
                        batch_size: int | None = None,
                        num_points: int = 1024, num_class: int = 10,
                        platforms=("cpu", "tpu")) -> dict:
    """Freeze `model` + `state` into an AOT bundle directory.

    `batch_size=None` (default) exports with a SYMBOLIC batch dimension:
    one artifact serves any batch size (the point count stays static —
    it shapes the kNN graphs). The model must have been built with
    `knn_backend="xla"` (Pallas calls would fail to lower for the other
    platform).
    """
    from jax import export as jexport

    os.makedirs(path, exist_ok=True)
    fn = _build_eval_fn(model, task)

    spec = lambda t: jax.tree_util.tree_map(  # noqa: E731
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype), t)
    bdim = (jexport.symbolic_shape("b")[0] if batch_size is None
            else batch_size)
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
        spec(state.params), spec(state.batch_stats),
        jax.ShapeDtypeStruct((bdim, num_points, 3), jnp.float32))
    with open(os.path.join(path, _FN_FILE), "wb") as f:
        f.write(exp.serialize())

    weights = {"params": state.params, "batch_stats": state.batch_stats}
    with open(os.path.join(path, _WEIGHTS_FILE), "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree_util.tree_map(np.asarray, weights)))

    meta = {
        "task": task, "batch_size": batch_size, "num_points": num_points,
        "num_class": num_class, "platforms": list(platforms),
        "format": "jax.export/stablehlo-v1",
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ServingModel:
    """A loaded AOT bundle: `predict(x)` with no model code in sight."""

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, _META_FILE)) as f:
            self.meta = json.load(f)
        with open(os.path.join(path, _FN_FILE), "rb") as f:
            self._fn = jexport.deserialize(f.read())
        with open(os.path.join(path, _WEIGHTS_FILE), "rb") as f:
            # device_put once: keeping the weights as host numpy would
            # re-transfer the whole tree on EVERY predict call
            self._weights = jax.tree_util.tree_map(
                jnp.asarray, serialization.msgpack_restore(f.read()))
        self._call = jax.jit(self._fn.call)

    def predict(self, x: np.ndarray) -> np.ndarray:
        """x [B, N, 3] -> class logits ([B, C] classification /
        [B, N, C] segmentation). N is fixed by the bundle; B too unless
        the bundle was exported batch-polymorphic (the default)."""
        B, N = self.meta["batch_size"], self.meta["num_points"]
        want = ("any" if B is None else B, N, 3)
        if (x.ndim != 3 or x.shape[1:] != (N, 3)
                or (B is not None and x.shape[0] != B)):
            raise ValueError(
                f"bundle expects {want} inputs, got {x.shape}")
        out = self._call(self._weights["params"],
                         self._weights["batch_stats"],
                         jnp.asarray(x, jnp.float32))
        return np.asarray(out)


def load_serving_bundle(path: str) -> ServingModel:
    return ServingModel(path)
