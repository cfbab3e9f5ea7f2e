from pod_compare_tpu.train.checkpoint import (
    Checkpointer,
    load_ensemble_params,
    load_params,
    resume_or_load,
    sibling_seed_dir,
)
from pod_compare_tpu.train.loss import LossConfig, compute_losses
from pod_compare_tpu.train.optim import (
    build_optimizer,
    trainable_mask,
    warmup_multistep_schedule,
)
from pod_compare_tpu.train.trainer import (
    TrainState,
    Trainer,
    create_train_state,
    make_train_step,
)

__all__ = [
    "Checkpointer",
    "load_ensemble_params",
    "load_params",
    "resume_or_load",
    "sibling_seed_dir",
    "LossConfig",
    "compute_losses",
    "build_optimizer",
    "trainable_mask",
    "warmup_multistep_schedule",
    "TrainState",
    "Trainer",
    "create_train_state",
    "make_train_step",
]
