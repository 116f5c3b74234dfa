from .mesh import initialize_multi_host, make_mesh  # noqa: F401
from .dp import make_dp_train_step, shard_batch  # noqa: F401
