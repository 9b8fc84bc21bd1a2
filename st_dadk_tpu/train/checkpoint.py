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
        return _orbax_state_dir(p) is not None
    return p.exists()


def _orbax_state_dir(p: Path):
    """Best available state dir, crash-tolerant (see _save_orbax's swap):
    `state` (normal), else `state.tmp` (fully written — the swap renames
    the old dir away before promoting tmp, so a crash in that window
    leaves only tmp+old), else `state.old` (pre-crash fallback). A path
    that IS an Orbax checkpoint itself (the user pointed at <ckpt>/state
    directly, or at a checkpoint written by plain Orbax) loads as-is, so
    checkpoint_exists() -> True always means load_checkpoint() succeeds."""
    for name in ("state", "state.tmp", "state.old"):
        if (p / name).exists():
            return p / name
    if (p / "_CHECKPOINT_METADATA").exists():
        return p
    return None


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
    # Crash-safe replace (the npz backend's tmp+os.replace semantics):
    # a bare save(force=True) DELETES the previous checkpoint before
    # writing, so a crash mid-save would lose all progress — exactly the
    # event checkpoints exist for. Write the new state beside the old one,
    # then swap; _orbax_state_dir makes every intermediate window loadable.
    import shutil
    tmp, final, old = path / "state.tmp", path / "state", path / "state.old"
    ckptr.save(tmp, payload, force=True)
    ckptr.wait_until_finished()
    if old.exists():
        shutil.rmtree(old)
    if final.exists():
        final.rename(old)
    tmp.rename(final)
    if old.exists():
        shutil.rmtree(old)


def _load_orbax(path) -> Tuple[Dict[str, Any], int, list]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    state_dir = _orbax_state_dir(Path(path).resolve())
    if state_dir is None:
        raise FileNotFoundError(f"no Orbax checkpoint under {path}")
    payload = ckptr.restore(state_dir)
    carry = jax.tree_util.tree_map(jnp.asarray, payload["carry"])
    carry["key"] = jax.random.wrap_key_data(
        jnp.asarray(payload["key_data"]))
    epochs_done = int(payload["epochs_done"])
    hist = {k: np.asarray(v) for k, v in payload.get("history", {}).items()}
    hists = [hist] if hist else []
    return carry, epochs_done, hists
