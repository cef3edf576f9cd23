"""Data/tensor-parallel attention over a device mesh.

Head (tensor) parallelism: Q/K/V heads sharded over the "model" axis; each
device runs the full Pallas FA2 kernel on its local heads with ZERO
communication inside attention (the all-reduce happens later, in the output
projection).  Batch sharded over "data" for DP.  This is new TPU-first
capability with no reference counterpart (SURVEY.md §2, parallelism table).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_flash_attention_tpu.kernels.attention import flash_attention
from cuda_flash_attention_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def qkv_partition_spec(mesh, *, data_axis=DATA_AXIS, model_axis=MODEL_AXIS):
    data = data_axis if data_axis in mesh.axis_names else None
    model = model_axis if model_axis in mesh.axis_names else None
    return P(data, model, None, None)


def shard_qkv(mesh, q, k, v, *, data_axis=DATA_AXIS, model_axis=MODEL_AXIS):
    """Place q/k/v on the mesh: batch over data axis, heads over model axis."""
    spec = qkv_partition_spec(mesh, data_axis=data_axis, model_axis=model_axis)
    sharding = NamedSharding(mesh, spec)
    return tuple(jax.device_put(x, sharding) for x in (q, k, v))


def mesh_interpret_default(mesh):
    """Pallas kernels must run interpreted when the mesh lives on non-TPU
    devices (the virtual CPU test fabric), regardless of the process's
    default backend."""
    return True if mesh.devices.flat[0].platform != "tpu" else None


def head_parallel_attention(
    mesh,
    q, k, v,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    tile_dtype=None,
    window: int | None = None,
    sinks: int = 0,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """shard_map'd FA2: per-device local kernel over (batch/data, heads/model)
    shards. Differentiable (custom_vjp runs shard-local; gradients shard the
    same way).  The sequence axis stays unsharded here, so a sliding
    ``window`` passes straight through to the local kernel."""
    spec = qkv_partition_spec(mesh, data_axis=data_axis, model_axis=model_axis)
    interpret = mesh_interpret_default(mesh)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    def _local(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale, tile_dtype=tile_dtype,
            window=window, sinks=sinks, interpret=interpret,
        )

    return _local(q, k, v)
