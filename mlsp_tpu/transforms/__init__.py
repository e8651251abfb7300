"""Pure-function (PRNG-keyed, jit-able) point-cloud transforms.

The reference does all of this on CPU with numpy per sample
(`utils/pc_utils.py`, `MLSP/mlsp.py:10-112`); here every transform is a
pure function of `(key, points)` with static shapes so it fuses into the
train step. Same distributions, different RNG streams.
"""

from mlsp_tpu.transforms.augment import (
    scale_to_unit_cube,
    rotate_shape,
    random_rotate_one_axis,
    jitter,
    translate,
    random_rotate_3d,
)
from mlsp_tpu.transforms.deform import (
    region_means,
    assign_regions,
    collapse_to_point_batch,
    deform_batch,
)
from mlsp_tpu.transforms.scan import scan_batch
from mlsp_tpu.transforms import extra

__all__ = [
    "scale_to_unit_cube",
    "rotate_shape",
    "random_rotate_one_axis",
    "jitter",
    "translate",
    "random_rotate_3d",
    "region_means",
    "assign_regions",
    "deform_batch",
    "collapse_to_point_batch",
    "scan_batch",
]
