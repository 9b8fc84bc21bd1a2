"""Checkpoint backends for the mid-training loop state.

Two interchangeable formats behind one interface (chosen by path):

  - ``*.npz``  — the self-contained numpy format (train.loop's default;
    single file, no extra deps, bit-exact resume).
  - directory — **Orbax** (`orbax.checkpoint.StandardCheckpointer`): the
    production JAX checkpointing stack (async-capable, sharding-aware,
    multi-host-ready). The carry pytree is saved as-is plus a small metadata
    dict (epochs_done, PRNG key data, concatenated history).

The reference has no mid-training checkpointing at all (model-best .pt files
only, SURVEY.md section 5.4); both backends here restore the COMPLETE loop
state — params, Adam moments, EMA, best-EMA, early-stop bookkeeping, PRNG —
bit-exactly (tests/test_checkpoint.py).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def is_orbax_path(path) -> bool:
    """Directory-like paths (no .npz suffix) select the Orbax backend."""
    return Path(path).suffix != ".npz"


def save_checkpoint(path, carry: Dict[str, Any], epochs_done: int,
                    hists: List[Dict[str, np.ndarray]]) -> None:
    """Dispatch by path: .npz -> numpy backend, else Orbax."""
    if is_orbax_path(path):
        _save_orbax(path, carry, epochs_done, hists)
    else:
        from st_dadk_tpu.train.loop import save_fit_checkpoint
        save_fit_checkpoint(path, carry, epochs_done, hists)


def load_checkpoint(path) -> Tuple[Dict[str, Any], int, list]:
    if is_orbax_path(path):
        return _load_orbax(path)
    from st_dadk_tpu.train.loop import load_fit_checkpoint
    return load_fit_checkpoint(path)


def checkpoint_exists(path) -> bool:
    p = Path(path)
    if is_orbax_path(path):
        return (p / "state").exists() or (p / "_CHECKPOINT_METADATA").exists()
    return p.exists()


def _save_orbax(path, carry: Dict[str, Any], epochs_done: int,
                hists: List[Dict[str, np.ndarray]]) -> None:
    import orbax.checkpoint as ocp

    state = dict(carry)
    key = state.pop("key")
    hist_cat = {k: np.concatenate([h[k] for h in hists])
                for k in (hists[0] if hists else {})}
    payload = {
        "carry": jax.tree_util.tree_map(np.asarray, state),
        "key_data": np.asarray(jax.random.key_data(key)),
        "epochs_done": np.asarray(epochs_done),
        "history": hist_cat,
    }
    path = Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    # Orbax refuses to overwrite; mirror the npz backend's replace semantics
    ckptr.save(path / "state", payload, force=True)
    ckptr.wait_until_finished()


def _load_orbax(path) -> Tuple[Dict[str, Any], int, list]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(Path(path).resolve() / "state")
    carry = jax.tree_util.tree_map(jnp.asarray, payload["carry"])
    carry["key"] = jax.random.wrap_key_data(
        jnp.asarray(payload["key_data"]))
    epochs_done = int(payload["epochs_done"])
    hist = {k: np.asarray(v) for k, v in payload.get("history", {}).items()}
    hists = [hist] if hist else []
    return carry, epochs_done, hists
