"""Persistent XLA compilation cache (opt-in for apps/bench).

First compiles of the mode-I frame step take tens of seconds on TPU; the
on-disk cache makes repeated app/bench runs start fast.
"""

import os


def enable_compile_cache(path: str | None = None):
    import jax
    # the axon relay backend does not implement executable serialization:
    # enabling the persistent cache there makes every compile fail with
    # UNIMPLEMENTED. Only enable it for standard platforms.
    platforms = str(getattr(jax.config, "jax_platforms", "") or "")
    if "axon" in platforms or "axon" in os.environ.get("JAX_PLATFORMS", ""):
        return
    path = path or os.environ.get("DAB_TPU_JIT_CACHE",
                                  os.path.expanduser("~/.cache/dab_tpu_jit"))
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
