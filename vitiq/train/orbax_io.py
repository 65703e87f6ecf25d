"""Orbax checkpoint backend (optional, production-scale).

The default checkpoint format (vitiq.train.checkpoint) is a self-contained
npz + JSON manifest — simple, pickle-free, fast at this model family's size
(1-5M params). For large-scale production training (SURVEY.md §5 prescribes
orbax for preemption-safe checkpointing), this module offers the same
save/load surface backed by orbax's OCDBT checkpointer: sharding-aware
restore (each host reads only its shards) and atomic directory commits that
survive preemption mid-write.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Tuple

from vitiq.config import ExperimentConfig
from vitiq.train.optim import TrainState


def save_checkpoint_orbax(
    directory: str | Path,
    state: TrainState,
    epoch: int,
    val_loss: float,
    history: Dict,
    config: Optional[ExperimentConfig] = None,
) -> Path:
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    directory.parent.mkdir(parents=True, exist_ok=True)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(directory / "state", state._asdict(), force=True)
    manifest = {
        "epoch": epoch,
        "val_loss": float(val_loss),
        "history": history,
        "config": config.to_dict() if config is not None else None,
    }
    (directory / "manifest.json").write_text(json.dumps(manifest, indent=2))
    return directory


def load_checkpoint_orbax(
    directory: str | Path, template_state: TrainState
) -> Tuple[TrainState, Dict]:
    """Restore with the template's structure/sharding (each device reads only
    its own shards under a mesh)."""
    import orbax.checkpoint as ocp

    directory = Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(directory / "state",
                                 target=template_state._asdict())
    manifest = json.loads((directory / "manifest.json").read_text())
    return TrainState(**restored), manifest
