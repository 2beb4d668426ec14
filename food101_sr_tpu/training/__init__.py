from .checkpoint import (load_checkpoint, load_train_checkpoint,
                         save_checkpoint, save_train_checkpoint,
                         warm_start_params)
from .loop import DEFAULTS, train
from .preempt import PreemptionGuard
from .schedule import EarlyStopping, ReduceLROnPlateau
from .state import SRTrainState, make_adam
from .steps import (
    add_noise,
    make_accum_apply,
    make_eval_step,
    make_forward,
    make_gan_d_step,
    make_gan_g_step,
    make_grad_step,
    make_train_step,
)

__all__ = [
    "DEFAULTS",
    "EarlyStopping",
    "PreemptionGuard",
    "ReduceLROnPlateau",
    "SRTrainState",
    "add_noise",
    "make_accum_apply",
    "load_checkpoint",
    "load_train_checkpoint",
    "make_adam",
    "make_eval_step",
    "make_forward",
    "make_gan_d_step",
    "make_gan_g_step",
    "make_grad_step",
    "make_train_step",
    "save_checkpoint",
    "save_train_checkpoint",
    "train",
    "warm_start_params",
]
