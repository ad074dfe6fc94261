from uniter_tpu.training.sched import (  # noqa: F401
    noam_schedule,
    warmup_linear,
    vqa_schedule,
    get_lr_schedule,
)
from uniter_tpu.training.optim import build_optimizer  # noqa: F401
from uniter_tpu.training.step import TrainState, make_train_step  # noqa: F401
