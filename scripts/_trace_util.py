"""Shared microbench helpers for the perf scripts.

Wall-clock timing is meaningless through the axon tunnel for sub-26 ms
programs (CLAUDE.md), so every experiment measures *device* op time from a
jax.profiler trace instead: ``timed`` runs the jitted fn REPS times inside
a trace and returns mean device milliseconds per call via ``device_op_ms``.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import tempfile


def device_op_ms(trace_dir) -> float:
    """Sum of device-track leaf op durations (ms) in the newest trace,
    excluding program/step envelope events."""
    files = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    data = json.loads(gzip.open(sorted(files)[-1]).read())
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device:" in n}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        base = e.get("name", "?").split(".")[0].split("(")[0]
        if base == "jit_run" or re.fullmatch(r"\d+", base):
            continue  # program/step envelopes
        total += e.get("dur", 0) / 1e3
    return total


def timed(fn, args, reps: int = 8) -> float:
    """Mean device ms per call of ``fn(*args)`` over ``reps`` traced calls
    (one untraced warmup/compile call first; a value readout forces
    completion through the tunnel's fire-and-forget dispatch)."""
    import jax
    import jax.numpy as jnp

    def force(out):
        leaves = jax.tree_util.tree_leaves(out)
        jax.block_until_ready(leaves)
        float(jnp.sum(leaves[-1].astype(jnp.float32)))

    force(fn(*args))
    tmp = tempfile.mkdtemp(prefix="trace_")
    with jax.profiler.trace(tmp):
        vals = [fn(*args) for _ in range(reps)]
        force(vals[-1])
        jax.block_until_ready(jax.tree_util.tree_leaves(vals))
    return device_op_ms(tmp) / reps
