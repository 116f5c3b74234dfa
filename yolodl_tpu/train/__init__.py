from .lr_schedule import LrScheduleConfig, lr_at_step, make_schedule_fn  # noqa: F401
from .checkpoint import (  # noqa: F401
    load_checkpoint,
    load_recent_checkpoint,
    load_recent_checkpoint_in_runs,
    save_checkpoint,
)
from .ema import ema_init, ema_update  # noqa: F401
from .loop import (  # noqa: F401
    TrainConfig,
    TrainState,
    make_multi_step,
    make_train_step,
    train_init,
)
