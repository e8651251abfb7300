from mlsp_tpu.train.state import TrainState, create_train_state, make_optimizer
from mlsp_tpu.train import steps
from mlsp_tpu.train.pointda_trainer import train_pointda, evaluate

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "steps",
    "train_pointda",
    "evaluate",
]
