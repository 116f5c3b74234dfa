"""Exponential moving average of parameters.

The reference lacks EMA, but the driver's milestone 4 recipe (BASELINE.md:
"YOLOv4-CSP full COCO training with ... EMA") requires it.  YOLOv5-style
warmup decay: d(step) = decay · (1 − exp(−step/τ)).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def ema_init(params: Any) -> Any:
    # materialize copies: aliasing the live param buffers breaks donation
    return jax.tree_util.tree_map(jnp.copy, params)


def ema_update(ema_params: Any, params: Any, step, decay: float = 0.9999,
               tau: float = 2000.0) -> Any:
    d = decay * (1.0 - jnp.exp(-(step.astype(jnp.float32) if hasattr(step, "astype")
                                 else jnp.float32(step)) / tau))
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, params
    )
