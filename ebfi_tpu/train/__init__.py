"""Training harness: config, optimizer, pjit'd train step, trainer loop."""
from .config import ConfigParser
from .optim import build_optimizer, build_lr_schedule
from .train_step import TrainState, make_train_step, make_eval_step, create_train_state

__all__ = [
    "ConfigParser",
    "build_optimizer",
    "build_lr_schedule",
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "create_train_state",
]
