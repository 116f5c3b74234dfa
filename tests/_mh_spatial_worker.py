"""Multi-host × spatial test worker: one process of a 2-process cluster
running the 2-D (data × space) spatially-sharded TRAIN step.

Spawned by tests/test_multihost.py (and __graft_entry__.dryrun_multichip's
multi-host stage).  8 global devices span 2 processes; the mesh is
(data=2, space=4) with the DATA axis crossing the process boundary, so the
step's psum-synced prefix BN and both gradient pmeans ride the distributed
runtime while halo exchange runs within each process group.
argv: process_id coordinator_port
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax

jax.config.update("jax_platforms", "cpu")
# the spatial shard_map step is a minutes-scale CPU compile on a loaded
# 1-core box — amortize across runs/processes via the persistent cache
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from yolodl_tpu.parallel.mesh import initialize_multi_host

initialize_multi_host(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert jax.device_count() == 8 and jax.local_device_count() == 4

import tempfile

import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from yolodl_tpu.config import darknet_cfg as dk
from yolodl_tpu.graph.from_darknet import graph_from_darknet
from yolodl_tpu.models import YoloModel
from yolodl_tpu.parallel.dp import replicate_state
from yolodl_tpu.parallel.spatial_model import (
    SPACE_AXIS,
    make_data_space_mesh,
    make_spatial_train_step,
)
from yolodl_tpu.train import TrainConfig, train_init

# real yolov4-tiny graph at a height divisible through the backbone strides
size = 128
cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "cfg", "darknet", "yolov4-tiny.cfg")
text = open(cfg_path).read().replace("width=416", f"width={size}").replace(
    "height=416", f"height={size}")
with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
    f.write(text)
    small_cfg = f.name
model = YoloModel(graph_from_darknet(dk.Darknet.load(small_cfg)))
config = TrainConfig()
ts, opt = train_init(model, config, seed=0)
mesh = make_data_space_mesh(2, 4)
step = make_spatial_train_step(model, opt, config, mesh)
ts = replicate_state(mesh, ts)

# every process builds the same global batch and hands over its shards
rng = np.random.default_rng(0)
images = rng.uniform(0, 1, (2, 3, size, size)).astype(np.float32)
boxes = np.zeros((2, 4, 4), np.float32)
boxes[:, 0] = (0.5, 0.5, 0.3, 0.3)
classes = np.zeros((2, 4), np.int32)
mask = np.zeros((2, 4), bool)
mask[:, 0] = True


def shard_global(x, spec):
    sh = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])


batch = (
    shard_global(images, P("data", None, SPACE_AXIS, None)),
    shard_global(boxes, P("data")),
    shard_global(classes, P("data")),
    shard_global(mask, P("data")),
)
ts, metrics = step(ts, *batch)
total = float(metrics["total_loss"])
assert np.isfinite(total)
print(f"MH_RESULT proc={pid} loss={total:.6f}", flush=True)
