"""Paged decode attention: one new query token per sequence against a paged
(possibly INT8/FP8) KV cache.

No reference counterpart (the reference is a training-shape kernel library,
SURVEY.md §2); this is the serving-path kernel the north star requires.
TPU-first design:

  * grid = (num_seqs, pages_per_seq) with the page dim "arbitrary": Pallas
    prefetches page p+1's K/V block from HBM while the MXU works on page p —
    the pipelined-DMA pattern that makes the bandwidth-bound decode hit HBM
    speed-of-light.  ALL KV heads of a sequence ride in one grid cell
    (they share the physical page) as batched MXU contractions — per-cell
    launch overhead, not FLOPs, dominates decode.
  * `pltpu.PrefetchScalarGridSpec`: the page table and sequence lengths are
    scalar-prefetched so the BlockSpec index maps can compute *data-dependent*
    HBM addresses (physical page id = page_table[seq, p]) ahead of the DMA —
    the TPU equivalent of vLLM-style gather addressing.
  * GQA-native: q is viewed as [seqs, kv_heads, group, D], so all query
    heads sharing a KV head attend in one MXU pass over each page — KV is
    read once per group, not once per query head.
  * Quantized pages dequantize in-kernel exactly like
    kernels/fa2_forward_quant.py: K's per-token scale folds into S's columns,
    V's into P — no dequantized page is ever materialized.
  * Skipped pages (p beyond the sequence's length) cost no compute and their
    index map clamps to the null page so no DMA bandwidth is wasted on dead
    data.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_flash_attention_tpu.decode.kv_cache import KVPages
from cuda_flash_attention_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    NUM_LANES,
    matmul_precision,
    resolve_interpret,
    kv_storage_cast,
    storage_cast,
)


# Batched-over-heads contractions: contract D (last dim), batch over the
# leading KV-head dim.
_BATCHED_QKT = (((2,), (2,)), ((0,), (0,)))   # [H,g,D] x [H,p,D] -> [H,g,p]
_BATCHED_PV = (((2,), (1,)), ((0,), (0,)))    # [H,g,p] x [H,p,D] -> [H,g,D]


def _decode_kernel(
    # scalar prefetch
    page_table_ref,  # [num_seqs, pages_per_seq] int32 (SMEM)
    lengths_ref,     # [num_seqs] int32 (SMEM)
    # inputs
    q_ref,   # [1, Hkv, group, D]
    k_ref,   # [Hkv, 1, page_size, D]   cache dtype
    ks_ref,  # [Hkv, 1, 1, page_size]   f32
    v_ref,   # [Hkv, 1, page_size, D]
    vs_ref,  # [Hkv, 1, 1, page_size]
    # outputs
    o_ref,   # [1, Hkv, group, D]
    # scratch
    m_scr, l_scr, acc_scr,  # [Hkv, group, NUM_LANES] x2, [Hkv, group, D]
    *,
    sm_scale: float,
    page_size: int,
    pages_per_seq: int,
    compute_dtype,
    window=None,
    sinks=0,
):
    """All KV heads of one sequence in ONE grid cell: they share the same
    physical page, so batching them trades n_kv_heads grid launches for one
    batched MXU contraction — the per-cell overhead dominates decode at
    large batch."""
    seq = pl.program_id(0)
    p = pl.program_id(1)
    length = lengths_ref[seq]

    @pl.when(p == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    # Sliding window: the sole query sits at position length-1 and sees keys
    # j >= length - window, so pages entirely before the window are dead —
    # per-step compute is O(window), not O(length).
    live = p * page_size < length
    if window is not None:
        in_win = (p + 1) * page_size > length - window
        if sinks > 0:
            in_win |= p * page_size < sinks
        live &= in_win

    @pl.when(live)
    def _run():
        hkv, group = q_ref.shape[1], q_ref.shape[2]
        head_dim = q_ref.shape[-1]
        q = q_ref[0].astype(compute_dtype)          # [Hkv, group, D]
        k = kv_storage_cast(
            k_ref[:, 0], head_dim, compute_dtype, ftz=True
        )  # [Hkv, page_size, D] (int4 pages unpack in-register)
        s = lax.dot_general(
            q, k, _BATCHED_QKT,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(q.dtype),
        )  # [Hkv, group, page_size]
        s *= ks_ref[:, 0] * sm_scale  # [Hkv, 1, page_size] broadcast

        # Mask the tail of the last active page (positions >= length) and,
        # with a sliding window, the stale head of the oldest live page.
        col = p * page_size + lax.broadcasted_iota(
            jnp.int32, (hkv, group, page_size), 2
        )
        keep = col < length
        if window is not None:
            in_win = col >= length - window
            if sinks > 0:
                in_win |= col < sinks
            keep &= in_win
        s += jnp.where(keep, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=2)[..., None]      # [Hkv, group, 1]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        prob = jnp.exp(s - m_next[..., :1])
        l_scr[...] = alpha * l_prev + jnp.sum(prob, axis=2)[..., None]
        m_scr[...] = m_next

        v = kv_storage_cast(v_ref[:, 0], head_dim, compute_dtype, ftz=True)
        prob_scaled = (prob * vs_ref[:, 0]).astype(compute_dtype)
        pv = lax.dot_general(
            prob_scaled, v, _BATCHED_PV,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(v.dtype),
        )  # [Hkv, group, D]
        acc_scr[...] = acc_scr[...] * alpha[..., :1] + pv

    @pl.when(p == pages_per_seq - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)  # inactive slot -> zeros
        o_ref[0] = (acc_scr[...] * l_inv[..., :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "compute_dtype", "window", "sinks", "interpret",
    ),
)
def paged_decode_attention(
    q,           # [num_seqs, n_heads, head_dim] — one token per slot
    pages: KVPages,
    page_table,  # [num_seqs, pages_per_seq] int32
    lengths,     # [num_seqs] int32 (0 for inactive slots)
    *,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
):
    """Flash-decoding over the paged cache. Returns [num_seqs, n_heads, D].

    ``window`` restricts each query (position length-1) to the last
    ``window`` keys: out-of-window pages are skipped (no DMA, no compute),
    so per-token cost is bounded by the window, not the context length.
    Stale page-table entries behind the window may be freed/reused by the
    engine — the index map never dereferences them."""
    num_seqs, n_heads, head_dim = q.shape
    n_kv_heads, num_pages, page_size, kv_dim = pages.k_pages.shape
    pages_per_seq = page_table.shape[1]
    assert n_heads % n_kv_heads == 0
    if window is not None:
        window = int(window)
        assert window >= 1
    sinks = int(sinks) if window is not None else 0
    group = n_heads // n_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / (head_dim ** 0.5)

    # Query heads sharing a KV head sit together: [seqs, kv_heads, group, D].
    q4 = q.reshape(num_seqs, n_kv_heads, group, head_dim)

    def q_map(s, p, pt_ref, len_ref):
        return (s, 0, 0, 0)

    def page_map(s, p, pt_ref, len_ref):
        # Clamp dead pages (beyond length, or entirely behind the sliding
        # window) to the null page 0 so the prefetch DMA doesn't touch cold
        # HBM — and never dereferences a recycled table entry.
        live = p * page_size < len_ref[s]
        if window is not None:
            in_win = (p + 1) * page_size > len_ref[s] - window
            if sinks > 0:
                in_win = jnp.logical_or(in_win, p * page_size < sinks)
            live = jnp.logical_and(live, in_win)
        return (0, lax.select(live, pt_ref[s, p], 0), 0, 0)

    kernel = functools.partial(
        _decode_kernel,
        sm_scale=float(sm_scale),
        page_size=page_size,
        pages_per_seq=pages_per_seq,
        compute_dtype=compute_dtype,
        window=window,
        sinks=sinks,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_seqs, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, n_kv_heads, group, head_dim), q_map),
            pl.BlockSpec((n_kv_heads, 1, page_size, kv_dim), page_map),
            pl.BlockSpec((n_kv_heads, 1, 1, page_size), page_map),
            pl.BlockSpec((n_kv_heads, 1, page_size, kv_dim), page_map),
            pl.BlockSpec((n_kv_heads, 1, 1, page_size), page_map),
        ],
        out_specs=pl.BlockSpec((1, n_kv_heads, group, head_dim), q_map),
        scratch_shapes=[
            pltpu.VMEM((n_kv_heads, group, NUM_LANES), jnp.float32),
            pltpu.VMEM((n_kv_heads, group, NUM_LANES), jnp.float32),
            pltpu.VMEM((n_kv_heads, group, head_dim), jnp.float32),
        ],
    )

    # Scales as [Hkv, pages, 1, page_size]: the (1, page_size) trailing block
    # satisfies Mosaic's (8, 128)-or-full-dim tiling rule and lands lane-major
    # for the broadcast over S's columns.
    k_scales = pages.k_scales[:, :, None, :]
    v_scales = pages.v_scales[:, :, None, :]
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q4.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=resolve_interpret(interpret),
    )(page_table, lengths, q4, pages.k_pages, k_scales,
      pages.v_pages, v_scales)
    return o.reshape(num_seqs, n_heads, head_dim)


def _chunk_kernel(
    # scalar prefetch
    page_table_ref,  # [num_seqs, pages_per_seq] int32 (SMEM)
    lengths_ref,     # [num_seqs] int32 — TOTAL length incl. the chunk
    # inputs
    q_ref,   # [1, Hkv, T*group, D]
    k_ref, ks_ref, v_ref, vs_ref,  # as in _decode_kernel
    # outputs
    o_ref,   # [1, Hkv, T*group, D]
    # scratch
    m_scr, l_scr, acc_scr,
    *,
    sm_scale: float,
    page_size: int,
    pages_per_seq: int,
    compute_dtype,
    chunk: int,   # T — queries per sequence
    group: int,   # query heads per KV head
    window=None,
    sinks=0,
):
    """Speculative-verification attention: T consecutive queries per
    sequence (positions length-T .. length-1) against the paged cache the
    chunk's K/V were just appended to.  Identical online-softmax scheme to
    `_decode_kernel`; the only new machinery is the per-ROW causal bound
    (query t sees positions <= length - T + t), which also covers the
    chunk's internal causality because its tokens live in the cache."""
    seq = pl.program_id(0)
    p = pl.program_id(1)
    length = lengths_ref[seq]

    @pl.when(p == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    live = p * page_size < length
    if window is not None:
        # Oldest key any query needs: (length - chunk) - (window - 1).
        in_win = (p + 1) * page_size > length - chunk - window + 1
        if sinks > 0:
            in_win |= p * page_size < sinks
        live &= in_win

    @pl.when(live)
    def _run():
        hkv, rows = q_ref.shape[1], q_ref.shape[2]
        head_dim = q_ref.shape[-1]
        q = q_ref[0].astype(compute_dtype)            # [Hkv, rows, D]
        k = kv_storage_cast(
            k_ref[:, 0], head_dim, compute_dtype, ftz=True
        )  # [Hkv, page_size, D] (int4 pages unpack in-register)
        s = lax.dot_general(
            q, k, _BATCHED_QKT,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(q.dtype),
        )  # [Hkv, rows, page_size]
        s *= ks_ref[:, 0] * sm_scale

        col = p * page_size + lax.broadcasted_iota(
            jnp.int32, (hkv, rows, page_size), 2
        )
        # Row r is query t = r // group at global position length-chunk+t.
        pos = (
            length - chunk
            + lax.broadcasted_iota(jnp.int32, (hkv, rows, page_size), 1)
            // group
        )
        keep = col <= pos
        if window is not None:
            in_win = col > pos - window
            if sinks > 0:
                in_win |= col < sinks
            keep &= in_win
        s += jnp.where(keep, 0.0, DEFAULT_MASK_VALUE)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=2)[..., None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        prob = jnp.exp(s - m_next[..., :1])
        prob = jnp.where(keep, prob, 0.0)  # fully-masked rows stay exact 0
        l_scr[...] = alpha * l_prev + jnp.sum(prob, axis=2)[..., None]
        m_scr[...] = m_next

        v = kv_storage_cast(v_ref[:, 0], head_dim, compute_dtype, ftz=True)
        prob_scaled = (prob * vs_ref[:, 0]).astype(compute_dtype)
        pv = lax.dot_general(
            prob_scaled, v, _BATCHED_PV,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(v.dtype),
        )
        acc_scr[...] = acc_scr[...] * alpha[..., :1] + pv

    @pl.when(p == pages_per_seq - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 0.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv[..., :1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "compute_dtype", "window", "sinks", "interpret",
    ),
)
def paged_chunk_attention(
    q,           # [num_seqs, T, n_heads, head_dim] — T new tokens per slot
    pages: KVPages,
    page_table,  # [num_seqs, pages_per_seq] int32
    lengths,     # [num_seqs] int32 — TOTAL length incl. the T chunk tokens
    *,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
):
    """Multi-query flash-decoding for speculative-decoding verification /
    chunked decode: the T chunk tokens' K/V must already be appended
    (`append_chunk_kv`), and query t attends causally up to its own global
    position length - T + t.  Returns [num_seqs, T, n_heads, D]."""
    num_seqs, chunk, n_heads, head_dim = q.shape
    n_kv_heads, num_pages, page_size, kv_dim = pages.k_pages.shape
    pages_per_seq = page_table.shape[1]
    assert n_heads % n_kv_heads == 0
    group = n_heads // n_kv_heads
    if sm_scale is None:
        sm_scale = 1.0 / (head_dim ** 0.5)
    if window is not None:
        window = int(window)
        assert window >= 1
    sinks = int(sinks) if window is not None else 0

    # Rows t-major within each KV head: [seqs, T, Hkv, group, D] ->
    # [seqs, Hkv, T*group, D] so row // group recovers the query index.
    q5 = q.reshape(num_seqs, chunk, n_kv_heads, group, head_dim)
    q4 = q5.transpose(0, 2, 1, 3, 4).reshape(
        num_seqs, n_kv_heads, chunk * group, head_dim
    )

    def q_map(s, p, pt_ref, len_ref):
        return (s, 0, 0, 0)

    def page_map(s, p, pt_ref, len_ref):
        live = p * page_size < len_ref[s]
        if window is not None:
            in_win = (p + 1) * page_size > len_ref[s] - chunk - window + 1
            if sinks > 0:
                in_win = jnp.logical_or(in_win, p * page_size < sinks)
            live = jnp.logical_and(live, in_win)
        return (0, lax.select(live, pt_ref[s, p], 0), 0, 0)

    kernel = functools.partial(
        _chunk_kernel,
        sm_scale=float(sm_scale),
        page_size=page_size,
        pages_per_seq=pages_per_seq,
        compute_dtype=compute_dtype,
        chunk=chunk,
        group=group,
        window=window,
        sinks=sinks,
    )
    rows = chunk * group
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_seqs, pages_per_seq),
        in_specs=[
            pl.BlockSpec((1, n_kv_heads, rows, head_dim), q_map),
            pl.BlockSpec((n_kv_heads, 1, page_size, kv_dim), page_map),
            pl.BlockSpec((n_kv_heads, 1, 1, page_size), page_map),
            pl.BlockSpec((n_kv_heads, 1, page_size, kv_dim), page_map),
            pl.BlockSpec((n_kv_heads, 1, 1, page_size), page_map),
        ],
        out_specs=pl.BlockSpec((1, n_kv_heads, rows, head_dim), q_map),
        scratch_shapes=[
            pltpu.VMEM((n_kv_heads, rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((n_kv_heads, rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((n_kv_heads, rows, head_dim), jnp.float32),
        ],
    )
    k_scales = pages.k_scales[:, :, None, :]
    v_scales = pages.v_scales[:, :, None, :]
    o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q4.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=resolve_interpret(interpret),
    )(page_table, lengths, q4, pages.k_pages, k_scales,
      pages.v_pages, v_scales)
    return (
        o.reshape(num_seqs, n_kv_heads, chunk, group, head_dim)
        .transpose(0, 2, 1, 3, 4)
        .reshape(num_seqs, chunk, n_heads, head_dim)
    )
