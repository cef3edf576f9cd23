"""Tensor-parallel serving: the paged decode path sharded over the mesh's
"model" axis (north-star multi-host serving, SURVEY.md §2 parallelism table).

Sharding layout (mirrors the training-side head parallelism in
parallel/sharded.py):
  * KV pages:   [n_kv_heads, ...] -> kv heads split over "model"; each
                device owns complete pages for its heads, so cache appends
                and the flash-decoding kernel are fully local.
  * Query:      [seqs, n_heads, D] -> heads over "model".  GQA groups never
                straddle devices because n_kv_heads % tp == 0 and query
                heads are ordered kv-head-major.
  * Page table / lengths: replicated (tiny int32).
  * Dense projections: standard TP (wq/wk/wv column-, wo row-sharded) under
    the jit partitioner via param_shardings — the all-reduce after wo is the
    only attention-path collective, and attention itself needs none.

The Pallas kernel cannot be auto-partitioned by XLA, so it runs as a
shard_map island; everything else stays pjit-sharded.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cuda_flash_attention_tpu.decode.attention import paged_decode_attention
from cuda_flash_attention_tpu.decode.kv_cache import KVPages
from cuda_flash_attention_tpu.parallel.mesh import MODEL_AXIS
from cuda_flash_attention_tpu.parallel.sharded import mesh_interpret_default


def kv_pages_spec(mesh, *, model_axis: str = MODEL_AXIS) -> KVPages:
    """PartitionSpecs for a KVPages pytree: kv heads over the model axis."""
    model = model_axis if model_axis in mesh.axis_names else None
    return KVPages(
        k_pages=P(model, None, None, None),
        k_scales=P(model, None, None),
        v_pages=P(model, None, None, None),
        v_scales=P(model, None, None),
    )


def shard_kv_pages(mesh, pages: KVPages, *, model_axis: str = MODEL_AXIS):
    spec = kv_pages_spec(mesh, model_axis=model_axis)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), pages, spec
    )


def tp_paged_decode_attention(
    mesh,
    q,            # [num_seqs, n_heads, D] — heads sharded over "model"
    pages: KVPages,
    page_table,   # replicated
    lengths,      # replicated
    *,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
    model_axis: str = MODEL_AXIS,
):
    """Head-parallel flash-decoding: each device runs the paged kernel on its
    local KV heads with zero attention-path communication."""
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        return paged_decode_attention(
            q, pages, page_table, lengths,
            sm_scale=sm_scale, compute_dtype=compute_dtype,
            interpret=mesh_interpret_default(mesh) if mesh is not None else None,
        )
    tp = mesh.shape[model_axis]
    n_kv_heads = pages.k_pages.shape[0]
    n_heads = q.shape[1]
    if n_kv_heads % tp or n_heads % tp:
        raise ValueError(
            f"the model-axis size {tp} must divide both n_kv_heads="
            f"{n_kv_heads} and n_heads={n_heads} (KV pages are head-sharded "
            f"and must stay device-local)"
        )
    interpret = mesh_interpret_default(mesh)
    q_spec = P(None, model_axis, None)
    pg_spec = kv_pages_spec(mesh, model_axis=model_axis)
    rep = P()

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(q_spec, pg_spec, rep, rep), out_specs=q_spec,
        check_vma=False,
    )
    def _local(q, pages, page_table, lengths):
        return paged_decode_attention(
            q, pages, page_table, lengths,
            sm_scale=sm_scale, compute_dtype=compute_dtype,
            interpret=interpret,
        )

    return _local(q, pages, page_table, lengths)
