from mlsp_tpu.data.pipeline import Dataset, batches, standardize_clouds
from mlsp_tpu.data.pointda import load_pointda, label_to_idx, idx_to_label
from mlsp_tpu.data.pointsegda import load_pointsegda
from mlsp_tpu.data import synthetic

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
