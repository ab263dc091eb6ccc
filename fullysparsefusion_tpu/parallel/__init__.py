from .train import (
    TrainState,
    cyclic_lr_schedule,
    make_optimizer,
    make_train_step,
    make_sharded_train_step,
    make_fsf_sharded_train_step,
    make_generic_train_step,
    make_generic_sharded_train_step,
    fsd_forward_fn,
    fsf_forward_fn,
)
