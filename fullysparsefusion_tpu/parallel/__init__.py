from .train import (
    TrainState,
    cyclic_lr_schedule,
    make_optimizer,
    make_train_step,
    make_sharded_train_step,
)
