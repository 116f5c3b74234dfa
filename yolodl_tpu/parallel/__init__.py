from .mesh import (  # noqa: F401
    initialize_multi_host,
    make_dp_shardings,
    make_mesh,
)
from .dp import (  # noqa: F401
    make_dp_train_step, shard_batch, shard_batch_multiprocess,
)
from .zero import make_zero_train_step, place_zero_state, zero_init  # noqa: F401
from .pipeline import (  # noqa: F401
    PipelineModel,
    PipelineTrainStep,
    plan_stages,
)
from .tp import (  # noqa: F401
    make_tp_infer,
    make_tp_mesh,
    make_tp_train_step,
    make_tp_zero_train_step,
    place_tp_state,
    place_tp_zero_state,
    shard_batch_tp,
    tp_shardings,
    tp_zero_shardings,
)
