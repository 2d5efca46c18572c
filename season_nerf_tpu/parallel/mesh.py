"""Device-mesh parallelism for Season-NeRF training.

The reference is strictly single-GPU (SURVEY.md §2 parallelism table); the
TPU-native scaling story is data parallelism over the ray batch — rays are
embarrassingly parallel, the ~4M-param MLP is replicated, and the only
collective is the gradient all-reduce XLA inserts automatically when a
jit-compiled loss averages over the sharded batch axis (GSPMD).  Sharding
layout:

  batch rows   [B, 22]   -> P("data")      split over the mesh
  params/opt   pytrees   -> P()            replicated
  rng keys     per-step  -> replicated (same key; sampling uses row indices)

A 1-D mesh rides ICI on a slice; multi-slice sweeps over *regions* are
independent jobs (the reference's multi_region_merge pattern) and need no
collectives at all.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh: asked for {n_devices} devices but only "
                f"{len(devices)} visible ({devices[0].platform}); refusing "
                "to silently build a smaller mesh")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    return jax.device_put(batch, batch_sharding(mesh))
