"""Shared app bootstrap."""

from __future__ import annotations

import os


def enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations.

    The multi-level alignment programs take tens of seconds to compile; the
    persistent cache (keyed on program + compiler version) makes every run
    after the first start in milliseconds. Opt out with
    PHOVO_NO_COMPILE_CACHE=1 or redirect with PHOVO_COMPILE_CACHE=<dir>.
    """
    if os.environ.get("PHOVO_NO_COMPILE_CACHE"):
        return
    import jax

    # CPU backend: LoadedExecutable.serialize() C-aborts for some CPU
    # executables in this jax build, and a write aborted mid-entry leaves a
    # corrupt cache file that later SEGFAULTS readers of the same key
    # (observed deterministically in the test suite once a CLI test flipped
    # the cache on mid-run).  CPU compiles are fast; the cache exists for
    # the tens-of-seconds TPU compiles.
    if jax.default_backend() == "cpu":
        return

    cache_dir = os.environ.get(
        "PHOVO_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "phovo_tpu", "jax",
        ),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
