"""Multi-host test worker: one process of a 2-process CPU "cluster".

Spawned by tests/test_multihost.py.  Joins the JAX distributed runtime via
``initialize_multi_host`` (the DCN extension point, SURVEY §2.8/§5.8), so
8 global devices span 2 processes; then runs the standard DP train step —
the SAME mesh/axis-name code as single-host, just a bigger data axis.
argv: process_id coordinator_port
"""
import os, sys
sys.path.insert(0, __import__("os").path.join(__import__("os").path.dirname(__import__("os").path.abspath(__file__)), ".."))
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from yolodl_tpu.parallel.mesh import initialize_multi_host
initialize_multi_host(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4, (
    jax.device_count(), jax.local_device_count())

import numpy as np
import jax.numpy as jnp
from yolodl_tpu.config import newslab as cfg
from yolodl_tpu.graph.ir import _flatten
from yolodl_tpu.models import YoloModel
from yolodl_tpu.parallel import make_dp_train_step, make_mesh
from yolodl_tpu.parallel.dp import replicate_state
from yolodl_tpu.train import TrainConfig, train_init
from yolodl_tpu.shapes import Shape

model_cfg = cfg.Model(groups={"m": (
    cfg.Input(name="input", shape=Shape(["_", 3, 32, 32])),
    cfg.ConvBn2D(name="c0", from_="input", c=8, k=3, s=2, p=1, act="leaky"),
    cfg.ConvBn2D(name="head", from_="c0", c=18, k=1, s=1, act="linear",
                 bn=cfg.BatchNormConfig(enabled=False)),
    cfg.Detect2D(name="det", from_="head", classes=1,
                 anchors=((0.3, 0.3), (0.5, 0.5), (0.7, 0.7))),
    cfg.MergeDetect2D(name="output", from_=("det",)),
)}, main_group="m")
model = YoloModel(_flatten(model_cfg))
config = TrainConfig()
ts, opt = train_init(model, config, seed=0)
mesh = make_mesh(8)
dp_step = make_dp_train_step(model, opt, config, mesh)
ts = replicate_state(mesh, ts)

# global batch 8, one image per global device; every process builds the
# same global arrays and hands its addressable shards to the runtime
rng = np.random.default_rng(0)
images = rng.normal(size=(8, 3, 32, 32)).astype(np.float32)
boxes = np.zeros((8, 4, 4), np.float32); boxes[:, 0] = (0.5, 0.5, 0.3, 0.3)
classes = np.zeros((8, 4), np.int32)
mask = np.zeros((8, 4), bool); mask[:, 0] = True

from jax.sharding import NamedSharding, PartitionSpec as P
def shard_global(x):
    sh = NamedSharding(mesh, P("data"))
    return jax.make_array_from_callback(
        x.shape, sh, lambda idx: x[idx])
batch = tuple(shard_global(np.asarray(a)) for a in (images, boxes, classes, mask))
ts, metrics = dp_step(ts, *batch)
total = float(metrics["total_loss"])
assert np.isfinite(total)
print(f"MH_RESULT proc={pid} loss={total:.6f}", flush=True)
