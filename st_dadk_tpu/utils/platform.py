"""Backend-selection bootstrap for CLI entry points.

The deployment environment may register the TPU-tunnel backend from a
sitecustomize that imports jax at interpreter start — at that point plain
`JAX_PLATFORMS=cpu` in the environment is read too late and scripts
silently dispatch every op through the tunnel (the test conftest documents
the same pitfall). Every CLI calls `apply_platform_env()` before its first
jax use so the documented recipe

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/train_st_interp.py ...

actually lands on a virtual CPU mesh.
"""
from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Force the live jax config to match the JAX_PLATFORMS env var.

    No-op when the variable is unset (jax picks its default backend) or when
    jax has already initialized a matching backend. Must run before the
    first backend initialization (device query / first dispatch)."""
    plats = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not plats:
        return
    import jax
    jax.config.update("jax_platforms", plats)
    # jax's jax_platforms config has NO backend-initialized validator (the
    # update silently succeeds even after a sitecustomize initialized the
    # tunnel backend), so verify the LIVE backend instead of relying on an
    # exception. default_backend() initializes backends if needed — which is
    # exactly the semantics we want: from here on the selection is fixed.
    backend = jax.default_backend()
    if plats.split(",")[0] != backend:
        print(f"[WARNING] JAX_PLATFORMS={plats} requested but the "
              f"{backend!r} backend is already initialized — ops will "
              f"dispatch to {backend!r}")
