"""Checkpoint save/load for the full TrainState.

Mirrors the reference's ``save_checkpoint``/``_load_checkpoint``
(``nerfstudio/engine/trainer.py:376-440``): ``step-{:09d}.ckpt`` files
holding step + params + buffers + optimizer state, optional
keep-only-latest. Leaves are stored flat in an npz; structure comes from a
template state built with the same config (shapes are static in this
framework, so the template always matches).
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def _unkey(x):
    """Typed PRNG keys -> raw uint32 data (npz-serializable)."""
    if hasattr(x, "dtype") and jax.dtypes.issubdtype(x.dtype,
                                                     jax.dtypes.prng_key):
        return jax.random.key_data(x)
    return x


def save_checkpoint(ckpt_dir, state, keep_only_latest: bool = True) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(state.step)
    leaves = [_unkey(l) for l in jax.tree.leaves(state)]
    path = ckpt_dir / f"step-{step:09d}.ckpt.npz"
    np.savez(path, n=len(leaves),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    if keep_only_latest:
        for old in ckpt_dir.glob("step-*.ckpt.npz"):
            if old != path:
                old.unlink()
    return path


def latest_checkpoint(ckpt_dir) -> Path | None:
    ckpts = sorted(Path(ckpt_dir).glob("step-*.ckpt.npz"))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path, template_state):
    """Restore into the structure of ``template_state``."""
    data = np.load(path)
    n = int(data["n"])
    leaves = [data[f"leaf_{i}"] for i in range(n)]
    treedef = jax.tree.structure(template_state)
    t_leaves = jax.tree.leaves(template_state)
    if len(t_leaves) != n:
        raise ValueError(
            f"checkpoint has {n} leaves, template has {len(t_leaves)} — "
            "config mismatch")
    cast = []
    for l, t in zip(leaves, t_leaves):
        if hasattr(t, "dtype") and jax.dtypes.issubdtype(
                t.dtype, jax.dtypes.prng_key):
            cast.append(jax.random.wrap_key_data(np.asarray(l)))
        else:
            cast.append(np.asarray(l, dtype=t.dtype).reshape(t.shape))
    return jax.tree.unflatten(treedef, cast)


def save_aux(ckpt_dir, tag: str, tree, step: int,
             keep_only_latest: bool = True) -> Path:
    """Save a sidecar pytree (e.g. camera_opt pose deltas) next to the
    main checkpoint without changing its format."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    leaves = [_unkey(l) for l in jax.tree.leaves(tree)]
    path = ckpt_dir / f"{tag}-{step:09d}.npz"
    np.savez(path, n=len(leaves),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    if keep_only_latest:
        for old in ckpt_dir.glob(f"{tag}-*.npz"):
            if old != path:
                old.unlink()
    return path


def latest_aux(ckpt_dir, tag: str) -> Path | None:
    files = sorted(Path(ckpt_dir).glob(f"{tag}-*.npz"))
    return files[-1] if files else None


def aux_for_checkpoint(ckpt_path, tag: str) -> Path | None:
    """Aux sidecar MATCHING the main checkpoint's step. With
    save_only_latest_checkpoint=False a user restoring an older
    step-*.ckpt.npz must not silently get pose deltas from a later step
    (round-4 advisor); fall back to the newest sidecar only with a
    warning when no step-matched file exists (e.g. it was pruned by
    keep_only_latest)."""
    ckpt_path = Path(ckpt_path)
    step = None
    stem = ckpt_path.name
    if stem.startswith("step-"):
        digits = stem[len("step-"):].split(".")[0]
        if digits.isdigit():
            step = int(digits)
    if step is not None:
        exact = ckpt_path.parent / f"{tag}-{step:09d}.npz"
        if exact.exists():
            return exact
    fallback = latest_aux(ckpt_path.parent, tag)
    if fallback is not None:
        import warnings

        warnings.warn(
            f"no {tag} aux file matches checkpoint step {step}; "
            f"falling back to newest sidecar {fallback.name} — its state "
            "may be from a later step than the restored params")
    return fallback


def load_aux(path, template):
    """Restore a sidecar pytree saved with ``save_aux``."""
    return load_checkpoint(path, template)
