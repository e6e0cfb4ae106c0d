"""Training infrastructure: optimizers, schedulers, checkpoints, trainer."""

from .optim import PlateauScheduler, init_adam, adam_update, clip_by_global_norm
from .trainer import Trainer, TrainConfig
from .checkpoint import save_checkpoint, load_checkpoint
