"""yolodl_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A ground-up rebuild of the capabilities of jerry73204/yolo-dl (a Rust/libtorch
YOLOv4 training + inference stack) designed for TPU hardware:

- models are compiled from darknet ``.cfg`` or NEWSLABv1 JSON5 descriptions into
  a flat DAG IR with static shape inference, then traced into a single jitted
  forward function (no per-node runtime dispatch),
- the loss/matcher stack is fully vectorized on device (no host round-trips),
- NMS is fixed-shape (top-k prefilter + masked iterative suppression),
- data parallelism is a ``jax.sharding.Mesh`` + ``shard_map`` with ``psum``
  gradient reduction over ICI,
- the host data pipeline is a staged, threaded loader with device prefetch.

Reference parity surface: /root/reference (see SURVEY.md at the repo root).
"""

__version__ = "0.1.0"
