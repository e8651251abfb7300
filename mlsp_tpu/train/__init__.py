from mlsp_tpu.train.state import TrainState, create_train_state, make_optimizer
from mlsp_tpu.train import steps
from mlsp_tpu.train import seg_steps
from mlsp_tpu.train.pointda_trainer import train_pointda, evaluate
from mlsp_tpu.train.pointsegda_trainer import train_pointsegda, evaluate_seg
from mlsp_tpu.train.spst import train_spst, select_pseudo_labels

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "steps",
    "seg_steps",
    "train_pointda",
    "evaluate",
    "train_pointsegda",
    "evaluate_seg",
    "train_spst",
    "select_pseudo_labels",
]
