from st_dadk_tpu.train.optimizer import (  # noqa: F401
    build_lr_tables,
    adamw_init,
    adamw_update,
    clip_by_global_norm,
    gradient_damping,
    ema_update,
)
from st_dadk_tpu.train.loop import (  # noqa: F401
    TrainData,
    fit,
    FitResult,
    predict,
)
