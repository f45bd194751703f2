from centerpose_tpu.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_train_step,
)
