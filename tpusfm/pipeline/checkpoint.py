"""Checkpointing for long (pod-scale) reconstructions.

The reference's checkpointing is its file-staged artifacts (SURVEY.md §5)
— kept here as the npz/PLY stage contract in pipeline.staged.  For long
BA/engine runs this module adds orbax-backed checkpoints of the full scene
state (the analog of optimizer-state checkpoints in training frameworks):
crash/preemption recovery resumes mid-reconstruction rather than at the
last stage boundary."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..sfm.scene import Scene, scene_to_numpy


def save_checkpoint(path: str | Path, scene: Scene, step: int = 0,
                    extra: dict | None = None) -> None:
    """Orbax checkpoint of a Scene (+ small metadata); falls back to npz if
    orbax is unavailable."""
    path = Path(path).resolve()
    state = {"scene": scene_to_numpy(scene), "step": np.asarray(step)}
    if extra:
        state["extra"] = {k: np.asarray(v) for k, v in extra.items()}
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, state, force=True)
    except ImportError:  # pragma: no cover
        np.savez_compressed(str(path) + ".npz", **_flatten(state))


def load_checkpoint(path: str | Path):
    """Returns (scene, step, extra dict)."""
    import jax.numpy as jnp

    path = Path(path).resolve()
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        state = ckptr.restore(path)
    except ImportError:  # pragma: no cover
        data = np.load(str(path) + ".npz")
        state = _unflatten(dict(data))
    sc = Scene(**{k: jnp.asarray(v) for k, v in state["scene"].items()})
    extra = state.get("extra") or {}
    return sc, int(state["step"]), extra


def _flatten(d, prefix=""):
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "/"))
        else:
            out[key] = v
    return out


def _unflatten(d):
    out: dict = {}
    for k, v in d.items():
        parts = k.split("/")
        cur = out
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v
    return out
