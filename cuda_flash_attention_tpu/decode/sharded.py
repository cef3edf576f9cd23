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

from cuda_flash_attention_tpu.decode.attention import (
    paged_chunk_attention,
    paged_decode_attention,
)
from cuda_flash_attention_tpu.decode.kv_cache import (
    KVPages,
    append_chunk_kv,
    append_token_kv,
    write_chunk_kv_paged,
)
from cuda_flash_attention_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from cuda_flash_attention_tpu.parallel.sharded import mesh_interpret_default


def mesh_dp(mesh, data_axis: str = DATA_AXIS) -> int:
    return mesh.shape[data_axis] if data_axis in mesh.axis_names else 1


def kv_pages_spec(mesh, *, model_axis: str = MODEL_AXIS,
                  data_axis: str | None = None,
                  stacked: bool = False) -> KVPages:
    """PartitionSpecs for a KVPages pytree: kv heads over the model axis;
    with ``data_axis``, the PAGE POOL additionally shards over data — each
    data shard owns its own physical pages (multi-host serving: every
    shard's slots allocate from its local pool, so appends and attention
    stay device-local with zero cross-data communication).
    ``stacked`` prepends the layer dim (init_kv_pages_stacked layout)."""
    model = model_axis if model_axis in mesh.axis_names else None
    data = data_axis if (data_axis and data_axis in mesh.axis_names) else None
    lead = (None,) if stacked else ()
    return KVPages(
        k_pages=P(*lead, model, data, None, None),
        k_scales=P(*lead, model, data, None),
        v_pages=P(*lead, model, data, None, None),
        v_scales=P(*lead, model, data, None),
    )


def shard_kv_pages(mesh, pages: KVPages, *, model_axis: str = MODEL_AXIS,
                   data_axis: str | None = None):
    spec = kv_pages_spec(mesh, model_axis=model_axis, data_axis=data_axis,
                         stacked=pages.stacked)
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
    window: int | None = None,
    sinks: int = 0,
    model_axis: str = MODEL_AXIS,
):
    """Head-parallel flash-decoding: each device runs the paged kernel on its
    local KV heads with zero attention-path communication."""
    if model_axis not in mesh.axis_names or mesh.shape[model_axis] == 1:
        return paged_decode_attention(
            q, pages, page_table, lengths,
            sm_scale=sm_scale, compute_dtype=compute_dtype, window=window,
            sinks=sinks,
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
            sm_scale=sm_scale, compute_dtype=compute_dtype, window=window,
            sinks=sinks, interpret=interpret,
        )

    return _local(q, pages, page_table, lengths)


def tp_chunk_append_attend(
    mesh,
    q,            # [num_seqs, T, n_heads, D] — heads sharded over "model"
    k_new,        # [num_seqs, T, n_kv_heads, D]
    v_new,
    pages: KVPages,
    page_table,   # [num_seqs, pages_per_seq] int32, shard-LOCAL page ids
    first_positions,  # [num_seqs] int32
    active,       # [num_seqs] bool
    total_lengths,    # [num_seqs] int32
    *,
    paged_write: bool = False,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
    window: int | None = None,
    sinks: int = 0,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Chunk append + multi-query flash-decoding over the mesh (the
    VERIFICATION / CHUNKED-PREFILL twin of dp_tp_append_attend): KV heads
    shard over "model", and — when the mesh carries a data axis — slots
    and the page pool shard over "data" (page_table holds LOCAL ids into
    each shard's pool slice), so the whole op is communication-free.
    Returns (o [num_seqs, T, n_heads, D], new pages)."""
    write = write_chunk_kv_paged if paged_write else append_chunk_kv
    tp = mesh.shape.get(model_axis, 1) if model_axis in mesh.axis_names else 1
    dp = mesh_dp(mesh, data_axis)
    if tp == 1 and dp == 1:
        pages = write(pages, k_new, v_new, page_table, first_positions,
                      active)
        o = paged_chunk_attention(
            q, pages, page_table, total_lengths,
            sm_scale=sm_scale, compute_dtype=compute_dtype, window=window,
            sinks=sinks, interpret=mesh_interpret_default(mesh),
        )
        return o, pages
    n_kv_heads = pages.k_pages.shape[0]
    n_heads = q.shape[2]
    if n_kv_heads % tp or n_heads % tp:
        raise ValueError(
            f"the model-axis size {tp} must divide both n_kv_heads="
            f"{n_kv_heads} and n_heads={n_heads} (KV pages are head-sharded "
            f"and must stay device-local)"
        )
    interpret = mesh_interpret_default(mesh)
    data = data_axis if dp > 1 else None
    model = model_axis if tp > 1 else None
    q_spec = P(data, None, model, None)
    pg_spec = kv_pages_spec(mesh, model_axis=model_axis,
                            data_axis=data)
    tbl_spec = P(data, None)
    slot_spec = P(data)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(q_spec, q_spec, q_spec, pg_spec, tbl_spec, slot_spec,
                  slot_spec, slot_spec),
        out_specs=(q_spec, pg_spec),
        check_vma=False,
    )
    def _local(q, k_new, v_new, pages, page_table, first_positions, active,
               total_lengths):
        pages = write(pages, k_new, v_new, page_table, first_positions,
                      active)
        o = paged_chunk_attention(
            q, pages, page_table, total_lengths,
            sm_scale=sm_scale, compute_dtype=compute_dtype, window=window,
            sinks=sinks, interpret=interpret,
        )
        return o, pages

    return _local(q, k_new, v_new, pages, page_table, first_positions,
                  active, total_lengths)


def dp_tp_append_attend(
    mesh,
    q,            # [num_seqs, n_heads, D] — seqs over "data", heads "model"
    k_new,        # [num_seqs, n_kv_heads, D]
    v_new,
    pages: KVPages,   # per-layer; page pool sharded over "data", heads "model"
    page_table,   # [num_seqs, pages_per_seq] int32, LOCAL page ids, "data"
    positions,    # [num_seqs] int32, "data"
    active,       # [num_seqs] bool, "data"
    lengths,      # [num_seqs] int32, "data"
    *,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
    window: int | None = None,
    sinks: int = 0,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Multi-host decode inner step: KV append + paged attention as ONE
    shard_map over (data, model).  Each data shard owns a private page pool
    (page_table entries are LOCAL ids into its slice) and its own slots, so
    the entire operation is communication-free — continuous batching across
    hosts costs zero collectives in the attention path (BASELINE.json
    north-star config 4).  Returns (o [num_seqs, n_heads, D], new pages)."""
    data = data_axis if data_axis in mesh.axis_names else None
    model = model_axis if model_axis in mesh.axis_names else None
    interpret = mesh_interpret_default(mesh)
    q_spec = P(data, model, None)
    kv_spec = P(data, model, None)
    pg_spec = kv_pages_spec(mesh, model_axis=model_axis, data_axis=data_axis)
    slot_spec = P(data)
    tbl_spec = P(data, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, pg_spec, tbl_spec, slot_spec,
                  slot_spec, slot_spec),
        out_specs=(q_spec, pg_spec),
        check_vma=False,
    )
    def _local(q, k_new, v_new, pages, page_table, positions, active,
               lengths):
        pages = append_token_kv(
            pages, k_new, v_new, page_table, positions, active
        )
        o = paged_decode_attention(
            q, pages, page_table, lengths,
            sm_scale=sm_scale, compute_dtype=compute_dtype, window=window,
            sinks=sinks, interpret=interpret,
        )
        return o, pages

    return _local(q, k_new, v_new, pages, page_table, positions, active,
                  lengths)
