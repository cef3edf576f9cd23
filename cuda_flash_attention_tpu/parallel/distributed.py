"""Multi-host scaffolding: process initialization and DCN-aware meshes.

The reference is single-GPU (SURVEY.md §2 — no process groups); this is the
north-star multi-host layer (BASELINE.json config 5: ">=85% tokens/s scaling
on a 2-host v5e slice"):

  * `initialize_distributed` wraps `jax.distributed.initialize` with the
    standard env-var conventions so the same training script runs unchanged
    on 1 process or N hosts (torchrun-style COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID, or the TPU runtime's automatic discovery).
  * `make_hybrid_mesh` builds a Mesh whose axes are laid out ICI-major:
    collectives over fast in-slice links wherever possible, with only the
    outermost (data) axis crossing the DCN between slices — the layout the
    scaling-book recipe prescribes (model/ctx axes must NEVER span hosts on
    a v5e pod slice).

On the single-process CPU test fabric the same entry points degrade to plain
meshes, so every code path is exercisable without a pod (SURVEY.md §4).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh

from cuda_flash_attention_tpu.parallel.mesh import (
    CTX_AXIS,
    DATA_AXIS,
    MODEL_AXIS,
    make_device_mesh,
)


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize the JAX distributed runtime for multi-host execution.

    Arguments default from the environment (COORDINATOR_ADDRESS,
    NUM_PROCESSES, PROCESS_ID); on TPU pods all three may be None and the
    runtime discovers the topology itself.  Returns True if the distributed
    service was (already) initialized, False when running single-process
    (no coordinator configured) — in which case this is a no-op, so scripts
    can call it unconditionally."""
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    # Public-API idempotence check: jax.distributed.initialize raises on a
    # second call, so probe via is_initialized when available (jax >= 0.4.34)
    # without reaching into jax._src (version-brittle — round-2 advisor).
    is_init = getattr(jax.distributed, "is_initialized", None)
    if callable(is_init) and is_init():
        return True
    if coordinator_address is None and num_processes is None:
        return False  # single-process run (pods set the env vars)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return True  # someone initialized it first — fine
        raise RuntimeError(
            "initialize_distributed() must run before any JAX computation "
            f"(distributed runtime rejected init: {e})"
        ) from e
    return True


def make_hybrid_mesh(
    ici_shape: dict[str, int],
    dcn_shape: dict[str, int] | None = None,
    *,
    devices=None,
    allow_split_physical_axes: bool = False,
) -> Mesh:
    """Mesh with `dcn_shape` axes crossing hosts (DCN) and `ici_shape` axes
    inside each slice (ICI).  Axis order in the result is dcn-major per axis:
    an axis present in both shapes gets size ici*dcn with the DCN factor
    outermost, so collectives reduce over ICI first.

    Example (2-host v5e-8): make_hybrid_mesh({"data": 2, "model": 4},
    {"data": 2}) -> Mesh {"data": 4, "model": 4} where the outer data factor
    is the host dimension.

    Single-process fallback: when every device belongs to one process (the
    CPU test fabric or one tunneled chip), the DCN factors simply multiply
    into a plain mesh — same axis names/sizes, so sharded programs compile
    identically."""
    dcn_shape = dict(dcn_shape or {})
    ici_shape = dict(ici_shape)
    for ax in dcn_shape:
        if ax not in ici_shape:
            ici_shape[ax] = 1
    if devices is None:
        devices = jax.devices()

    n_procs = len({d.process_index for d in devices})
    combined = {
        ax: ici_shape[ax] * dcn_shape.get(ax, 1) for ax in ici_shape
    }
    if n_procs == 1 or not dcn_shape or all(v == 1 for v in dcn_shape.values()):
        return make_device_mesh(combined, devices=devices)

    from jax.experimental import mesh_utils

    mesh_arr = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=tuple(ici_shape.values()),
        dcn_mesh_shape=tuple(dcn_shape.get(ax, 1) for ax in ici_shape),
        devices=devices,
        allow_split_physical_axes=allow_split_physical_axes,
    )
    return Mesh(mesh_arr, axis_names=tuple(ici_shape.keys()))


def two_host_serving_mesh(tp: int, *, devices=None) -> Mesh:
    """North-star config 5 convenience: data parallel across hosts (DCN),
    tensor parallel inside each host (ICI)."""
    if devices is None:
        devices = jax.devices()
    n_hosts = max(len({d.process_index for d in devices}), 1)
    per_host = len(devices) // n_hosts
    if per_host % tp:
        raise ValueError(f"tp={tp} must divide devices/host ({per_host})")
    return make_hybrid_mesh(
        {DATA_AXIS: per_host // tp, MODEL_AXIS: tp},
        {DATA_AXIS: n_hosts},
        devices=devices,
    )


# ---------------------------------------------------------------------------
# Scaling-efficiency benchmark (virtual-fabric capable).
# ---------------------------------------------------------------------------


def scaling_efficiency_bench(
    n_devices: int = 8,
    *,
    devices=None,
    batch: int = 8,
    seq: int = 512,
    steps: int = 2,
    cfg=None,
) -> dict:
    """Train-step tokens/sec under three mesh layouts over the same devices:
    pure DP {data:N}, DP x TP {data:N/2, model:2}, and pure SP {ctx:N}
    (ring attention).  On the virtual CPU fabric the absolute numbers are
    meaningless — what this proves is that every layout compiles AND executes
    the full training step; on a real slice the same function reports true
    scaling efficiency (BASELINE.json: >=85% on a 2-host v5e slice)."""
    import time

    import jax.numpy as jnp

    from cuda_flash_attention_tpu.models import (
        TransformerConfig,
        init_opt_state,
        init_params,
        make_train_step,
        param_shardings,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    if devices is None:
        devices = jax.devices()
        if len(devices) < n_devices:
            devices = jax.devices("cpu")
    devices = devices[:n_devices]
    cfg = cfg or TransformerConfig.tiny()
    batch = max(batch, n_devices)  # batch must shard over the data axis

    layouts = {
        f"dp{n_devices}": {DATA_AXIS: n_devices},
        f"dp{n_devices // 2}_tp2": {DATA_AXIS: n_devices // 2, MODEL_AXIS: 2},
        f"ctx{n_devices}": {CTX_AXIS: n_devices},
    }
    results = {}
    for name, shape in layouts.items():
        mesh = make_device_mesh(shape, devices=devices)
        params = init_params(jax.random.PRNGKey(0), cfg)
        shardings = param_shardings(mesh, cfg)
        params = jax.tree.map(jax.device_put, params, shardings)
        opt_state = jax.tree.map(
            jax.device_put, init_opt_state(params), shardings
        )
        data_axis = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
        tokens = jax.device_put(
            jnp.ones((batch, seq + 1), jnp.int32),
            NamedSharding(mesh, P(data_axis, None)),
        )
        train_step = jax.jit(make_train_step(cfg, mesh=mesh))
        params, opt_state, loss = train_step(params, opt_state, tokens)  # warm
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(steps):
            params, opt_state, loss = train_step(params, opt_state, tokens)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / steps
        results[name] = {
            "tokens_per_sec": round(batch * seq / dt, 1),
            "step_ms": round(dt * 1e3, 2),
            "loss_finite": bool(jnp.isfinite(loss)),
        }
    # On a VIRTUAL CPU mesh these layouts compile-and-execute but the
    # timings are compile-proofs, not performance: emulated-collective
    # wall clock says nothing about ICI scaling, and a "vs_dp" ratio
    # formatted like a speedup misleads.  Keep only the proof bits there.
    virtual = all(d.platform == "cpu" for d in devices)
    if virtual:
        for r in results.values():
            r.pop("tokens_per_sec")
            r.pop("step_ms")
            r["virtual_cpu"] = True
    else:
        base = results[f"dp{n_devices}"]["tokens_per_sec"]
        for name, r in results.items():
            r["vs_dp"] = (
                round(r["tokens_per_sec"] / base, 3) if base else None
            )
    return results
