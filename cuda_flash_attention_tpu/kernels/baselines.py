"""Baseline attention kernels: FA1 and un-tuned ("naive") FA2.

Capability parity with the reference's comparison kernel family:

* FA1 (/root/reference/kernels/f-attn.cu:18-206): one grid cell per
  (batch, head) with the KV sweep OUTER and Q tiles INNER, and the running
  (O, l, m) statistics living in *global* arrays that are re-read and
  re-written on every tile pair (:86-110, :188-203).  The TPU analog grids
  over (B, H, KV-blocks) and keeps (O, l, m) in revisited output blocks —
  Pallas holds a revisited block in VMEM for the duration, so this is the
  same algorithm with the same extra rescaling traffic, minus the
  pathological HBM round-trips CUDA suffers.

* Naive-FA2 (/root/reference/kernels/plain-attn.cu:19-202): the same
  Q-tile-parallel schedule as the optimized FA2 but with none of the tuning
  (scalar dot products, serial softmax in the reference; here: fixed minimal
  128-blocks, eager per-tile normalization, no causal tile-skip, no prefetch
  remap).  Forward only, fp32 only — the reference dispatcher rejects
  fp16/backward for both baselines (include/dispatcher.h:32-35, 74-83).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cuda_flash_attention_tpu.kernels.common import (
    DEFAULT_MASK_VALUE,
    MIN_BLOCK,
    NUM_LANES,
    TRANS_B_DIMS,
    lanes_broadcast,
    matmul_precision,
    pad_to_block,
    resolve_interpret,
)


# ---------------------------------------------------------------------------
# FA1
# ---------------------------------------------------------------------------


def _fa1_kernel(
    q_ref,  # [1, 1, Sq, D]   (full Q per (b, h))
    k_ref,  # [1, 1, block_k, D]
    v_ref,
    o_ref,  # [1, 1, Sq, D]   revisited across KV steps
    m_ref,  # [1, 1, Sq, NUM_LANES]
    l_ref,
    *,
    sm_scale: float,
    kv_len: int,
    block_k: int,
    mask_kv_tail: bool,
):
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)
        m_ref[...] = jnp.full(m_ref.shape, -jnp.inf, jnp.float32)
        l_ref[...] = jnp.zeros(l_ref.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    head_dim = q.shape[-1]
    precision = matmul_precision(q.dtype)
    s = lax.dot_general(
        q, k, TRANS_B_DIMS, preferred_element_type=jnp.float32,
        precision=precision,
    )
    if sm_scale != 1.0:
        s *= sm_scale
    if mask_kv_tail:
        col_ids = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s += jnp.where((kv_idx * block_k + col_ids) < kv_len, 0.0, DEFAULT_MASK_VALUE)

    # FA1 update: fully renormalized output every step (f-attn.cu:188-203).
    m_prev = m_ref[0, 0]
    l_prev = l_ref[0, 0]
    o_prev = o_ref[0, 0].astype(jnp.float32)
    m_curr = jnp.max(s, axis=1)[:, None]
    m_new = jnp.maximum(m_prev, m_curr)
    p = jnp.exp(s - lanes_broadcast(m_new, s.shape[1]))
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    pv = lax.dot(
        p.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32, precision=precision,
    )
    l_new_inv = jnp.where(l_new == 0.0, 1.0, 1.0 / l_new)
    o_new = (
        lanes_broadcast(l_prev * alpha * l_new_inv, head_dim) * o_prev
        + lanes_broadcast(l_new_inv, head_dim) * pv
    )
    o_ref[0, 0] = o_new.astype(o_ref.dtype)
    m_ref[0, 0] = m_new
    l_ref[0, 0] = l_new


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_k", "kv_len", "interpret")
)
def _fa1_aligned(q, k, v, *, sm_scale, block_k, kv_len, interpret=None):
    batch, heads, q_len, head_dim = q.shape
    kv_len_pad = k.shape[2]
    grid = (batch, heads, kv_len_pad // block_k)

    kernel = functools.partial(
        _fa1_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_k=block_k,
        mask_kv_tail=(kv_len != kv_len_pad),
    )
    o, m, l = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, q_len, head_dim), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, ki: (b, h, ki, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, q_len, head_dim), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, q_len, NUM_LANES), lambda b, h, ki: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, q_len, NUM_LANES), lambda b, h, ki: (b, h, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((batch, heads, q_len, NUM_LANES), jnp.float32),
            jax.ShapeDtypeStruct((batch, heads, q_len, NUM_LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=resolve_interpret(interpret),
    )(q, k, v)
    del m, l
    return o


def fa1_attention(q, k, v, *, sm_scale=None, block_k: int = 128, interpret=None):
    """FlashAttention-1 baseline (forward only, like the reference)."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    kv_len = k.shape[2]
    q_pad = pad_to_block(q, 2, MIN_BLOCK)
    k_pad = pad_to_block(k, 2, block_k)
    v_pad = pad_to_block(v, 2, block_k)
    o = _fa1_aligned(
        q_pad, k_pad, v_pad,
        sm_scale=float(sm_scale), block_k=block_k, kv_len=kv_len,
        interpret=interpret,
    )
    return o[:, :, : q.shape[2], :]


# ---------------------------------------------------------------------------
# Naive FA2
# ---------------------------------------------------------------------------


def _naive_fa2_kernel(
    q_ref, k_ref, v_ref, o_ref,
    m_scr, l_scr, acc_scr,
    *,
    sm_scale: float,
    kv_len: int,
    block_k: int,
    num_kv_blocks: int,
    mask_kv_tail: bool,
):
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    head_dim = q.shape[-1]
    precision = matmul_precision(q.dtype)
    s = lax.dot_general(
        q, k, TRANS_B_DIMS, preferred_element_type=jnp.float32,
        precision=precision,
    )
    if sm_scale != 1.0:
        s *= sm_scale
    if mask_kv_tail:
        col_ids = lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s += jnp.where((kv_idx * block_k + col_ids) < kv_len, 0.0, DEFAULT_MASK_VALUE)

    # Eager normalization every tile (the "plain" schedule,
    # plain-attn.cu:103-160): 2 extra VPU multiplies per element vs the
    # optimized kernel's deferred divide.
    m_prev = m_scr[...]
    l_prev = l_scr[...]
    m_curr = jnp.max(s, axis=1)[:, None]
    m_new = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - lanes_broadcast(m_new, s.shape[1]))
    l_new = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
    pv = lax.dot(
        p.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32, precision=precision,
    )
    l_new_inv = jnp.where(l_new == 0.0, 1.0, 1.0 / l_new)
    acc_scr[...] = (
        acc_scr[...] * lanes_broadcast(l_prev * alpha * l_new_inv, head_dim)
        + pv * lanes_broadcast(l_new_inv, head_dim)
    )
    m_scr[...] = m_new
    l_scr[...] = l_new

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        o_ref[0, 0] = acc_scr[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "kv_len", "interpret"))
def _naive_fa2_aligned(q, k, v, *, sm_scale, kv_len, interpret=None):
    batch, heads, q_len, head_dim = q.shape
    kv_len_pad = k.shape[2]
    block_q = block_k = MIN_BLOCK  # fixed minimal blocks: deliberately untuned
    num_kv_blocks = kv_len_pad // block_k
    grid = (batch, heads, q_len // block_q, num_kv_blocks)

    kernel = functools.partial(
        _naive_fa2_kernel,
        sm_scale=sm_scale,
        kv_len=kv_len,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        mask_kv_tail=(kv_len != kv_len_pad),
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, head_dim), lambda b, h, qi, ki: (b, h, qi, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, qi, ki: (b, h, ki, 0)),
            pl.BlockSpec((1, 1, block_k, head_dim), lambda b, h, qi, ki: (b, h, ki, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=resolve_interpret(interpret),
    )(q, k, v)


def naive_fa2_attention(q, k, v, *, sm_scale=None, interpret=None):
    """Un-tuned FA2 baseline (forward only, fp32 only, like the reference)."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    kv_len = k.shape[2]
    q_pad = pad_to_block(q, 2, MIN_BLOCK)
    k_pad = pad_to_block(k, 2, MIN_BLOCK)
    v_pad = pad_to_block(v, 2, MIN_BLOCK)
    o = _naive_fa2_aligned(
        q_pad, k_pad, v_pad, sm_scale=float(sm_scale), kv_len=kv_len,
        interpret=interpret,
    )
    return o[:, :, : q.shape[2], :]
