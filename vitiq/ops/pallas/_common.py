"""Shared plumbing for the Pallas kernel modules."""

from __future__ import annotations

import os

from jax.experimental import pallas as pl


def generic_interpret() -> bool:
    """VITIQ_PALLAS_INTERPRET=1: run every pallas_call through the GENERIC
    pallas interpreter (plain JAX ops). Unlike pltpu.force_tpu_interpret_mode
    this composes with jax.shard_map/jit partitioning on multi-device CPU
    meshes, so the virtual-mesh dryrun can certify the fused kernels'
    shard_map plumbing + numerics without TPU hardware."""
    return os.environ.get("VITIQ_PALLAS_INTERPRET") == "1"


def pallas_call(*args, **kwargs):
    """pl.pallas_call with the interpret knob applied — ALL vitiq kernels
    must go through this wrapper so the gating can't drift per module."""
    kwargs.setdefault("interpret", generic_interpret())
    return pl.pallas_call(*args, **kwargs)
