"""JAX platform selection helper for CLI entry points.

Standard JAX honors the ``JAX_PLATFORMS`` environment variable, but some
managed containers install a ``sitecustomize`` that force-registers an
accelerator plugin and overwrites ``jax_platforms`` after the env var has
been read — so ``JAX_PLATFORMS=cpu deepFilter …`` silently still targets
the accelerator (and hangs if its transport is down). The jax config knob
set *after* import wins over both; entry points call this to restore the
documented env-var semantics.
"""

import os


def honor_jax_platforms_env() -> None:
    """Re-assert ``JAX_PLATFORMS`` from the environment over any
    sitecustomize override. No-op when the variable is unset (the
    platform default — including a registered TPU plugin — applies).

    Must run before the first computation; safe any time before backend
    initialization.
    """
    plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return
    import jax

    jax.config.update("jax_platforms", plats)
