"""Honor JAX_PLATFORMS in spite of the remote-TPU sitecustomize.

The axon environment's sitecustomize imports jax at interpreter startup
and force-registers the TPU platform via
``jax.config.update("jax_platforms", ...)`` — which OVERRIDES a caller's
``JAX_PLATFORMS=cpu`` environment request (the config was already read by
the time the script runs). A "CPU" run then silently targets the remote
chip: slower, contends with real chip work, and wedges with the tunnel.
tests/conftest.py and __graft_entry__.dryrun_multichip carry this
workaround; this helper centralizes it for the CLIs.
"""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """If the caller exported JAX_PLATFORMS, re-apply it over whatever the
    sitecustomize forced — BEFORE any backend is initialized. No-op when
    the env var is unset or a backend already exists."""
    want = os.environ.get("JAX_PLATFORMS", "").strip()
    if not want:
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except RuntimeError:
        pass  # backends already initialized — too late to change
