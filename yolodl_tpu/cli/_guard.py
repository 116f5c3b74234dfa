"""CLI error boundary: user-facing errors print one clear line, not a wall.

The reference CLIs surface config problems as anyhow error chains rather
than panics (train/src/main.rs:23, detect/src/main.rs:32); the equivalent
here is catching the exception types our config/dataset layers raise for
user mistakes and printing ``error: ...``.  Unexpected exceptions still
traceback, and ``YOLODL_DEBUG=1`` forces tracebacks for everything.
"""

from __future__ import annotations

import os
import sys

# Exception types raised for user mistakes (bad paths, malformed JSON5/cfg,
# wrong version, schema violations). Everything else — including TypeError,
# which essentially always signals a programming bug — keeps its traceback.
# The one-liner includes the raise site so a misclassified internal
# ValueError/KeyError is still reportable without rerunning.
_USER_ERRORS = (
    FileNotFoundError,
    IsADirectoryError,
    NotADirectoryError,
    PermissionError,
    ValueError,
    KeyError,
)


def run(main) -> None:
    # Persistent XLA compilation cache, on by default for every CLI
    # (YDL_NO_COMPILE_CACHE=1 opts out; JAX_COMPILATION_CACHE_DIR
    # overrides the location).  Flagship-model compiles take minutes on a
    # remote-TPU host — without the cache every train/eval/detect/serve
    # invocation (and every segment of a segmented run) pays them again
    # and multiplies exposure to transient remote-compile failures.
    if not os.environ.get("YDL_NO_COMPILE_CACHE"):
        import jax

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or \
            os.path.join(os.path.expanduser("~"), ".cache", "yolodl_tpu",
                         "jax_cache")
        try:
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except OSError:
            pass  # unwritable cache location never blocks the CLI

    # YDL_DEBUG_NANS=1: every jit re-runs op-by-op on a NaN and raises at
    # the producing op — the development-mode analog of the reference's
    # debug-assert ndarray cross-checks (SURVEY §4.3; book/training.md
    # recommends debug assertions on during development).  Costly; never
    # the default.
    if os.environ.get("YDL_DEBUG_NANS"):
        import jax

        jax.config.update("jax_debug_nans", True)
    try:
        rc = main()
        # some mains return their result object for tests; only ints are
        # exit codes
        sys.exit(rc if isinstance(rc, int) else 0)
    except KeyboardInterrupt:
        sys.exit(130)
    except BrokenPipeError:
        # stdout consumer (e.g. `| head`) went away: the Unix convention is
        # a silent exit, not a traceback.  Redirect stdout to devnull so the
        # interpreter's shutdown flush doesn't re-raise.
        devnull = os.open(os.devnull, os.O_WRONLY)
        os.dup2(devnull, sys.stdout.fileno())
        sys.exit(141)  # 128 + SIGPIPE
    except _USER_ERRORS as e:
        if os.environ.get("YOLODL_DEBUG"):
            raise
        msg = str(e) or repr(e)
        if isinstance(e, KeyError):
            msg = f"missing config key {msg}"
        elif isinstance(e, FileNotFoundError):
            msg = f"file not found: {e.filename or msg}"
        print(f"error: {msg}", file=sys.stderr)
        tb = e.__traceback__
        while tb is not None and tb.tb_next is not None:
            tb = tb.tb_next
        if tb is not None:
            frame = tb.tb_frame
            print(f"({type(e).__name__} at "
                  f"{frame.f_code.co_filename}:{tb.tb_lineno}; "
                  "set YOLODL_DEBUG=1 for a full traceback)", file=sys.stderr)
        sys.exit(1)
