"""Production serving: micro-batched detection service + HTTP front-end.

The reference ships only a batch `detect` CLI (detect/src/main.rs); this
subsystem adds the deployment surface a production user needs: a
long-lived process that keeps the compiled model warm and serves
individual requests at high throughput by micro-batching them into the
fixed-shape jitted program (XLA requires static shapes — the batcher is
what turns a stream of single images into MXU-efficient batches).
"""

from .service import DetectionService, ServiceStats
from .http_server import make_http_server

__all__ = ["DetectionService", "ServiceStats", "make_http_server"]
