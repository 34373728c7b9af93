"""Training harness: state, fused step, loop, checkpointing."""

from .checkpoint import CheckpointManager
from .loop import LoopConfig, train_loop
from .state import (EvalState, GANTrainState, create_state, d_variables,
                    eval_state_from_raw, g_variables)
from .step import GANSpec, jit_train_step, make_train_step

__all__ = [
    "GANTrainState", "EvalState", "create_state", "eval_state_from_raw",
    "g_variables", "d_variables",
    "GANSpec", "make_train_step", "jit_train_step",
    "LoopConfig", "train_loop",
    "CheckpointManager",
]
