"""Pytree key-path naming shared by the TB logging taxonomy and the
checkpoint key layout.

One definition so the device-side scalar panel (train/loop.param_maxima),
the host-side one (train/logging.log_weights_and_grads) and the checkpoint
flattener (train/checkpoint) can never drift apart on how a parameter path
is spelled.
"""

from __future__ import annotations


def path_entry_str(entry) -> str:
    """One jax key-path entry (DictKey/SequenceKey/...) as a bare string."""
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    return str(entry)


def tree_path_name(path) -> str:
    """A full key path joined with '/' — the TB/checkpoint key spelling."""
    return "/".join(path_entry_str(p) for p in path)
