from mlsp_tpu.data.pipeline import Dataset, batches, standardize_clouds
from mlsp_tpu.data.pointda import load_pointda, label_to_idx, idx_to_label
from mlsp_tpu.data.pointsegda import load_pointsegda
from mlsp_tpu.data import synthetic
from mlsp_tpu.data.meta import load_padded_npy
from mlsp_tpu.data import download

__all__ = [
    "Dataset",
    "batches",
    "standardize_clouds",
    "load_pointda",
    "load_pointsegda",
    "label_to_idx",
    "idx_to_label",
    "synthetic",
]
