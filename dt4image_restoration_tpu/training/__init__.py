from dt4image_restoration_tpu.training.trainer import (
    Trainer,
    TrainState,
    make_optimizer,
    make_lr_schedule,
    make_watch_grad_fn,
    masked_mse_loss,
)
from dt4image_restoration_tpu.training.sharding import (
    make_mesh,
    make_shard_map_train_step,
    make_train_step,
    shard_batch,
    shard_params,
)

__all__ = ["Trainer", "TrainState", "make_optimizer", "make_lr_schedule",
           "masked_mse_loss", "make_watch_grad_fn", "make_mesh", "make_shard_map_train_step",
           "make_train_step", "shard_batch", "shard_params"]
