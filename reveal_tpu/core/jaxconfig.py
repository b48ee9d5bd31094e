"""Central JAX runtime configuration.

Sets up the persistent compilation cache so CLI invocations don't pay
recompilation for the (deep, sort-heavy) index kernels, and provides the
default device/mesh helpers.
"""

from __future__ import annotations

import os

_configured = False


def configure_jax() -> None:
    """Idempotent JAX setup; call before first kernel dispatch."""
    global _configured
    if _configured:
        return
    import jax

    # honor an explicit JAX_PLATFORMS=cpu request even when a plugin
    # sitecustomize overrode the variable at interpreter startup (the
    # axon TPU tunnel does this); subprocesses of the test/sim harness
    # rely on it to stay off the accelerator
    want = os.environ.get("REVEAL_TPU_PLATFORM") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if want == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    cache_dir = os.environ.get(
        "REVEAL_TPU_JAX_CACHE", os.path.expanduser("~/.cache/reveal_tpu_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    _configured = True
