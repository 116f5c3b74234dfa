"""Learning-rate schedules.

Equivalent capability to ``tch-goodies/src/lr_schedule.rs``: Constant and
StepWise (piecewise-constant by step thresholds, must start at step 0,
monotonic).  Resume = evaluate at any step (the reference's ``set_step``
binary search, lr_schedule.rs:68-91) — trivially stateless here.

Adds the darknet [net] policy family (burn-in warmup + steps/scales decay,
net.rs policies) so darknet cfg training recipes run unchanged.

``make_schedule_fn`` returns a jnp-traceable step→lr function usable inside
a jitted train step (optax injection), so LR changes never retrace.
"""

from __future__ import annotations

import bisect
import dataclasses
from typing import Callable, Tuple, Union

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LrScheduleConfig:
    """type: "constant" | "stepwise" | "darknet"."""

    kind: str = "constant"
    lr: float = 1e-3
    # stepwise: [(step, lr)], first step must be 0, steps strictly increasing
    steps: Tuple[Tuple[int, float], ...] = ()
    # darknet policy=steps: decay thresholds + multiplicative scales, burn-in
    darknet_steps: Tuple[int, ...] = ()
    darknet_scales: Tuple[float, ...] = ()
    burn_in: int = 0
    burn_in_power: float = 4.0

    def __post_init__(self):
        if self.kind == "stepwise":
            if not self.steps or self.steps[0][0] != 0:
                raise ValueError("stepwise steps must start from zero")
            for (a, la), (b, lb) in zip(self.steps, self.steps[1:]):
                if b <= a:
                    raise ValueError("stepwise steps must be monotonic")
            if any(lr <= 0 for _, lr in self.steps):
                raise ValueError("learning rate must be positive")
        elif self.kind == "constant":
            if self.lr < 0:
                raise ValueError("the lr must be positive")

    @staticmethod
    def parse(raw: Union[dict, float, int, None]) -> "LrScheduleConfig":
        """Parse the JSON5 config form: {type: Constant, lr} or
        {type: StepWise, steps: [[step, lr], ...]}."""
        if raw is None:
            return LrScheduleConfig()
        if isinstance(raw, (int, float)):
            return LrScheduleConfig(kind="constant", lr=float(raw))
        t = raw.get("type", "Constant").lower()
        if t == "constant":
            return LrScheduleConfig(kind="constant", lr=float(raw["lr"]))
        if t in ("stepwise", "step_wise"):
            steps = tuple((int(s), float(lr)) for s, lr in raw["steps"])
            return LrScheduleConfig(kind="stepwise", steps=steps)
        raise ValueError(f"unknown lr schedule type {t!r}")


def lr_at_step(config: LrScheduleConfig, step: int) -> float:
    """Host-side scalar evaluation (exact reference semantics)."""
    if config.kind == "constant":
        return config.lr
    if config.kind == "stepwise":
        thresholds = [s for s, _ in config.steps]
        idx = bisect.bisect_right(thresholds, step) - 1
        idx = max(idx, 0)
        return config.steps[idx][1]
    if config.kind == "darknet":
        lr = config.lr
        if config.burn_in > 0 and step < config.burn_in:
            return lr * (step / config.burn_in) ** config.burn_in_power
        for threshold, scale in zip(config.darknet_steps, config.darknet_scales):
            if step >= threshold:
                lr *= scale
        return lr
    raise ValueError(f"unknown schedule kind {config.kind!r}")


def make_schedule_fn(config: LrScheduleConfig) -> Callable:
    """Traceable step→lr function (step may be a traced int array)."""
    if config.kind == "constant":
        return lambda step: jnp.asarray(config.lr, jnp.float32)

    if config.kind == "stepwise":
        thresholds = jnp.asarray([s for s, _ in config.steps], jnp.int32)
        lrs = jnp.asarray([lr for _, lr in config.steps], jnp.float32)

        def stepwise(step):
            idx = jnp.sum((thresholds <= step).astype(jnp.int32)) - 1
            return lrs[jnp.maximum(idx, 0)]

        return stepwise

    if config.kind == "darknet":
        thresholds = jnp.asarray(config.darknet_steps, jnp.int32)
        scales = jnp.asarray(config.darknet_scales, jnp.float32)

        def darknet(step):
            step_f = step.astype(jnp.float32) if hasattr(step, "astype") else jnp.float32(step)
            lr = jnp.asarray(config.lr, jnp.float32)
            decay = jnp.prod(jnp.where(thresholds <= step, scales, 1.0)) if len(
                config.darknet_steps
            ) else 1.0
            lr = lr * decay
            if config.burn_in > 0:
                warm = lr * (step_f / config.burn_in) ** config.burn_in_power
                lr = jnp.where(step < config.burn_in, warm, lr)
            return lr

        return darknet

    raise ValueError(f"unknown schedule kind {config.kind!r}")
