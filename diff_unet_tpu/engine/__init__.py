from diff_unet_tpu.engine.train import (  # noqa: F401
    TrainState,
    linear_warmup_cosine,
    make_optimizer,
    make_train_step,
)
