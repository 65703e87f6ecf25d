"""Checkpoint / resume.

Feature parity with the reference's checkpoint dicts (ref:
ViT/training/utils.py:550-618 — epoch, model/optimizer/scheduler state,
val_loss, full history, config) plus the rawIQ arm's per-experiment
config.json (ref: transformer_rawIQ/training/train.py:378-381), with two
deliberate upgrades over the reference:

* no pickle: parameters/optimizer state are stored as an .npz of pytree
  leaves + a JSON manifest (the reference `torch.load`s trusted pickles,
  SURVEY.md §2.8 item 9);
* restore is structure-checked: leaves are matched against a freshly built
  TrainState for the same config, so a config/checkpoint mismatch fails loudly
  instead of silently loading garbage.

Layout per checkpoint:  <path>.npz (leaves) + <path>.json (manifest).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vitiq.config import ExperimentConfig
from vitiq.train.optim import TrainState


def _flatten(tree) -> Tuple[list, Any]:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    return leaves, treedef


def save_checkpoint(
    path: str | Path,
    state: TrainState,
    epoch: int,
    val_loss: float,
    history: Dict,
    config: Optional[ExperimentConfig] = None,
    extra: Optional[Dict] = None,
) -> Path:
    """Write <path>.npz + <path>.json. Returns the npz path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, _ = _flatten(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    npz_path = path.with_suffix(".npz")
    np.savez(npz_path, **arrays)
    manifest = {
        "format_version": 1,
        "num_leaves": len(leaves),
        "epoch": epoch,
        "val_loss": float(val_loss),
        "history": history,
        "config": config.to_dict() if config is not None else None,
        "extra": extra or {},
    }
    path.with_suffix(".json").write_text(json.dumps(manifest, indent=2))
    return npz_path


def load_checkpoint(path: str | Path, template_state: TrainState) -> Tuple[TrainState, Dict]:
    """Restore a TrainState into the structure of `template_state` (built from
    the same config). Returns (state, manifest)."""
    path = Path(path)
    npz_path = path if path.suffix == ".npz" else path.with_suffix(".npz")
    json_path = npz_path.with_suffix(".json")
    manifest = json.loads(json_path.read_text())

    leaves, treedef = _flatten(template_state)
    if manifest["num_leaves"] != len(leaves):
        raise ValueError(
            f"checkpoint has {manifest['num_leaves']} leaves but the model/optimizer "
            f"built from the current config has {len(leaves)} — config mismatch?"
        )
    with np.load(npz_path) as data:
        new_leaves = []
        for i, tmpl in enumerate(leaves):
            arr = data[f"leaf_{i}"]
            tmpl_shape = tuple(getattr(tmpl, "shape", ()))
            if tuple(arr.shape) != tmpl_shape:
                raise ValueError(
                    f"leaf {i}: checkpoint shape {arr.shape} != expected {tmpl_shape}"
                )
            new_leaves.append(jnp.asarray(arr, dtype=getattr(tmpl, "dtype", arr.dtype)))
    state = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return state, manifest


def save_params(path: str | Path, params) -> Path:
    """Parameters-only snapshot (the reference's model_best.pth analogue)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves, _ = _flatten(params)
    npz_path = path.with_suffix(".npz")
    np.savez(npz_path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return npz_path


def load_params(path: str | Path, template_params):
    path = Path(path)
    npz_path = path if path.suffix == ".npz" else path.with_suffix(".npz")
    leaves, treedef = _flatten(template_params)
    with np.load(npz_path) as data:
        new_leaves = [
            jnp.asarray(data[f"leaf_{i}"], dtype=l.dtype) for i, l in enumerate(leaves)
        ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
