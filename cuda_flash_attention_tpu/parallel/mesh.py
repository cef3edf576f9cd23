"""Device mesh construction — the collectives backbone.

The reference has NO distributed layer (SURVEY.md §2: no NCCL/MPI, single
GPU).  On TPU the platform provides the transport (ICI within a slice, DCN
across slices) and XLA inserts the collectives; this module owns the mesh
and axis conventions used across the framework:

  axis        sharding                      used for
  ----        --------                      --------
  "data"      batch dim                     DP
  "model"     heads / d_ff / vocab          TP (attention runs head-local)
  "ctx"       sequence dim of K/V (and Q)   SP / ring attention long context
  "expert"    MoE expert dim                EP (models/moe.py dispatch einsums)
  "pipe"      layer-stage dim               PP (models/pipeline.py)
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"
CTX_AXIS = "ctx"
EXPERT_AXIS = "expert"
PIPE_AXIS = "pipe"


def make_device_mesh(
    mesh_shape: dict[str, int] | None = None,
    *,
    devices=None,
) -> Mesh:
    """Build a Mesh. ``mesh_shape`` maps axis name -> size, e.g.
    {"data": 2, "model": 4}; axes of size 1 are fine. Defaults to all
    devices on the "data" axis."""
    if devices is None:
        devices = jax.devices()
    if mesh_shape is None:
        mesh_shape = {DATA_AXIS: len(devices)}
    sizes = list(mesh_shape.values())
    n = int(np.prod(sizes))
    if n > len(devices):
        raise ValueError(
            f"mesh {mesh_shape} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(arr, axis_names=tuple(mesh_shape.keys()))


def cpu_test_mesh(mesh_shape: dict[str, int]) -> Mesh:
    """Mesh over host-platform (CPU) devices — the virtual 8-device test
    fabric (XLA_FLAGS=--xla_force_host_platform_device_count=8)."""
    return make_device_mesh(mesh_shape, devices=jax.devices("cpu"))
