from nerface_tpu.train.schedule import exponential_lr
from nerface_tpu.train.state import TrainState, create_train_state
from nerface_tpu.train.step import make_train_step

__all__ = [
    "exponential_lr",
    "TrainState",
    "create_train_state",
    "make_train_step",
]
