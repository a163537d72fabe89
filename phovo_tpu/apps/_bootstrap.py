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

    cache_dir = os.environ.get(
        "PHOVO_COMPILE_CACHE",
        os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "phovo_tpu", "jax",
        ),
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
