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


def device_barrier(tree) -> None:
    """Wait until every device computation producing `tree` has finished.

    `jax.block_until_ready` is NOT a reliable barrier on the experimental
    TPU-tunnel backend ('axon'): measured 2026-08-18, it returns in ~0.1 ms
    for a 4096^3 matmul whose value-fetch takes ~29 ms — i.e. it only waits
    for local dispatch, not remote execution. The tunnel's bounded in-flight
    queue gives looped timings approximate backpressure-correctness, but
    single-shot `block_until_ready` timings read ~0 (scripts/profile_init.py
    produced 0.0-ms GMM timings that way).

    A one-element host fetch of every output leaf is a true barrier on all
    backends: the transfer cannot complete before the producing program
    does. The tiny slices are batched into ONE device_get call so the
    per-leaf tunnel RPCs overlap instead of serializing (ADVICE r3: a
    sequential per-leaf loop adds n_leaves x round-trip inside timed
    sections). Use this instead of block_until_ready in every
    timing/profiling path."""
    import jax
    jax.block_until_ready(tree)  # cheap, and sufficient on cpu/direct-tpu
    slivers = [leaf.ravel()[:1] for leaf in jax.tree_util.tree_leaves(tree)
               if hasattr(leaf, "ravel") and getattr(leaf, "size", 0)]
    if slivers:
        jax.device_get(slivers)


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
