"""flax.linen model zoo (channels-last, static head selection).

Reference parity map:
  PointNet     <- `PointDA/Models.py:26-79`
  DGCNN        <- `PointDA/Models.py:82-162` (flagship)
  DGCNNSeg     <- `PointSegDA/Models.py:197-242` (DGCNN_DefRec)
  PointNet2SSG <- pointnet2_ops-based encoders (BASELINE config #3)
  PointTransformer <- `PointDA/Models.py:289-531` (group+ViT encoder)
  PointViT     <- `PointDA/vit_utils.py:68-283` (working redesign of the
                  reference's bit-rotted ViT variant)
"""

from mlsp_tpu.models.pointnet import PointNet
from mlsp_tpu.models.dgcnn import DGCNN
from mlsp_tpu.models.dgcnn_seg import DGCNNSeg
from mlsp_tpu.models.pointnet2 import PointNet2SSG

__all__ = ["PointNet", "DGCNN", "DGCNNSeg", "PointNet2SSG", "make_model"]


def make_model(name: str, num_classes: int, **kw):
    name = name.lower()
    if name == "pointnet":
        return PointNet(num_classes=num_classes, **kw)
    if name == "dgcnn":
        if kw.get("edge_impl", "auto") == "auto":
            # resolve the chip's EdgeConv winner NOW, outside any jit
            # trace (measures once per device kind, cached persistently)
            from mlsp_tpu.utils import chipcal

            chipcal.edge_calibration()
        return DGCNN(num_classes=num_classes, **kw)
    if name == "dgcnn_seg":
        return DGCNNSeg(num_classes=num_classes, **kw)
    if name in ("pointnet2", "pointnet2_ssg"):
        return PointNet2SSG(num_classes=num_classes, **kw)
    if name in ("point_transformer", "transformer"):
        from mlsp_tpu.models.transformer import PointTransformer

        return PointTransformer(num_classes=num_classes, **kw)
    if name in ("hengshuang", "hengshuang_transformer"):
        from mlsp_tpu.models.hengshuang import HengshuangTransformer

        return HengshuangTransformer(num_classes=num_classes, **kw)
    if name == "hengshuang_seg":
        from mlsp_tpu.models.hengshuang import HengshuangSeg

        return HengshuangSeg(num_classes=num_classes, **kw)
    if name == "vit":
        from mlsp_tpu.models.vit import PointViT

        return PointViT(num_classes=num_classes, **kw)
    raise ValueError(f"unknown model {name!r}")
