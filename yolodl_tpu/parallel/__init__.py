from .mesh import initialize_multi_host, make_mesh  # noqa: F401
from .dp import make_dp_train_step, shard_batch  # noqa: F401
from .zero import make_zero_train_step, place_zero_state, zero_init  # noqa: F401
