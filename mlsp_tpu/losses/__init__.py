"""Loss library: DefRec/Chamfer, normals, density (KL + L1), PCM mixup, CE.

Faithful ports of `MLSP/mlsp.py:222-468` and `MLSP/PCM.py:76-89` semantics
(weights, scalers, masking) in channels-last JAX.
"""

from mlsp_tpu.losses.losses import (
    DEFREC_SCALER,
    cross_entropy,
    defrec_loss,
    scan_rec_loss,
    normal_loss,
    masked_normal_loss,
    region_weights,
    density_loss,
    mixup_cross_entropy,
    transported_normal_loss,
    transported_density_loss,
)

__all__ = [
    "DEFREC_SCALER",
    "cross_entropy",
    "defrec_loss",
    "scan_rec_loss",
    "normal_loss",
    "masked_normal_loss",
    "region_weights",
    "density_loss",
    "mixup_cross_entropy",
    "transported_normal_loss",
    "transported_density_loss",
]
