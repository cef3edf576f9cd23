"""Pallas FlashAttention-2 forward kernel.

TPU-native redesign of the reference CUDA FA2 forward
(/root/reference/kernels/kernel_fa2_optimized.cu:20-347 fp32 and
kernel_fa2_optimized_f16.cu:21-350 fp16-in-SHM):

  CUDA reference                      TPU design (this file)
  ---------------------------------   -----------------------------------------
  grid: (batch*heads*Q-tiles) blocks  grid: (B, H, Q-blocks, KV-blocks); KV is
  with an in-kernel KV loop           the innermost "arbitrary" dim so Pallas
                                      pipelines HBM->VMEM K/V block DMAs
                                      (double-buffered) behind the MXU
  SHM tiles + register tiling 4x4     VMEM blocks; QK^T and PV are single MXU
  per thread                          `lax.dot_general` calls per tile
  warp-shuffle max/sum reductions     VPU lane reductions (jnp.max/sum axis=1)
  fp16-in-SHM variant                 `tile_dtype` parameter: blocks cast to
                                      bf16/fp16 before the matmuls, softmax
                                      stats always fp32 (SURVEY.md §7)
  -FLT_MAX tail padding               zero-pad to block grid + in-kernel mask
  logsumexp = log(l) + m              identical contract
                                      (kernel_fa2_optimized.cu:339-344)

The kernel keeps the FA2 deferred-normalization form: the accumulator is
rescaled only by alpha = exp(m_prev - m_next) per tile and divided by l once
at the final KV block (one VPU divide per output element instead of two
multiplies per tile).
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
    NUM_LANES,
    TRANS_B_DIMS,
    below_or_on_diag,
    build_block_mask,
    matmul_precision,
    resolve_interpret,
    tile_cast,
)


def _fa2_fwd_kernel(
    *refs,
    sm_scale: float,
    causal: bool,
    mask_value: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    tile_dtype,
    mask_kv_tail: bool,
    has_segments: bool,
):
    if has_segments:
        (q_ref, k_ref, v_ref, qseg_ref, kvseg_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
        qseg_ref = kvseg_ref = None
    # Ref shapes: q/o [1,1,block_q,D]; k/v [1,1,block_k,D];
    # lse [1,1,block_q,NUM_LANES]; qseg [1,block_q,1]; kvseg [1,1,block_k];
    # scratch m/l [block_q,NUM_LANES] f32, acc [block_q,D] f32.
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)
    head_dim = q_ref.shape[-1]

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    if causal:
        should_run = below_or_on_diag(q_idx, block_q, kv_idx, block_k)
    else:
        should_run = True

    @pl.when(should_run)
    def _run():
        q = tile_cast(q_ref[0, 0], tile_dtype)
        k = tile_cast(k_ref[0, 0], tile_dtype)
        precision = matmul_precision(q.dtype)
        s = lax.dot_general(
            q, k, TRANS_B_DIMS,
            preferred_element_type=jnp.float32, precision=precision,
        )  # [block_q, block_k]
        if sm_scale != 1.0:
            s *= sm_scale

        mask = build_block_mask(
            q_idx, kv_idx, block_q, block_k,
            causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kvseg_ref[0] if has_segments else None,
        )
        if mask is not None:
            s += jnp.where(mask, 0.0, mask_value)

        m_prev = m_scr[...]  # [block_q, 128] (lane-replicated)
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # [block_q, 128]
        alpha = jnp.exp(m_prev - m_next)
        # Single-lane broadcast (m_next[:, :1]) instead of a materialized
        # lane-tile: saves a (block_q, block_k) VPU copy per KV step.
        p = jnp.exp(s - m_next[:, :1])
        if mask is not None:
            # Exact zero for masked entries: for causal/tail masks exp
            # already underflows to 0, but a FULLY-masked row (possible with
            # segment ids) would otherwise normalize the mask value itself.
            p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = l_next

        v = tile_cast(v_ref[0, 0], tile_dtype)
        pv = lax.dot(
            tile_cast(p, tile_dtype).astype(v.dtype), v,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(v.dtype),
        )  # [block_q, D]
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv[:, :1]).astype(o_ref.dtype)
        # logsumexp contract parity: log(sum exp(s - m)) + m
        # (/root/reference/kernels/kernel_fa2_optimized.cu:339-344).
        lse_ref[0, 0] = m_scr[...] + jnp.log(jnp.where(l == 0.0, 1.0, l))


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "kv_len",
        "tile_dtype", "kv_groups", "interpret", "debug",
    ),
)
def fa2_forward_aligned(
    q,  # [B, Hq, Sq_pad, D], Sq_pad % block_q == 0
    k,  # [B, Hq // kv_groups, Skv_pad, D], Skv_pad % block_k == 0
    v,
    q_seg=None,   # [B, Sq_pad, 1] int32 (sequence-packing segment ids)
    kv_seg=None,  # [B, 1, Skv_pad] int32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,  # true (unpadded) kv length, for tail masking
    tile_dtype=None,
    kv_groups: int = 1,
    interpret=None,
    debug: bool = False,
):
    """Block-aligned FA2 forward. Returns (O, lse_rep) where lse_rep is the
    lane-replicated logsumexp [B, Hq, Sq_pad, NUM_LANES] (fp32) saved as the
    backward residual.

    ``kv_groups`` enables kernel-native GQA: query head h reads KV head
    h // kv_groups straight from HBM — no repeated KV materialization, so KV
    HBM traffic stays 1x regardless of the group size."""
    batch, heads, q_len, head_dim = q.shape
    kv_len_pad = k.shape[2]
    assert q_len % block_q == 0 and kv_len_pad % block_k == 0
    assert k.shape[1] * kv_groups == heads
    num_kv_blocks = kv_len_pad // block_k
    grid = (batch, heads, q_len // block_q, num_kv_blocks)

    def q_index_map(b, h, qi, ki):
        return (b, h, qi, 0)

    def kv_index_map(b, h, qi, ki):
        if causal:
            # Skipped (above-diagonal) blocks prefetch block 0 for the next
            # Q row instead of wasting DMA bandwidth on dead data.
            ki = lax.select(below_or_on_diag(qi, block_q, ki, block_k), ki, 0)
        return (b, h // kv_groups, ki, 0)

    has_segments = q_seg is not None
    kernel = functools.partial(
        _fa2_fwd_kernel,
        sm_scale=sm_scale,
        causal=causal,
        mask_value=DEFAULT_MASK_VALUE,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        tile_dtype=tile_dtype,
        mask_kv_tail=(kv_len != kv_len_pad),
        has_segments=has_segments,
    )

    in_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
        pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
        pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
    ]
    inputs = [q, k, v]
    if has_segments:
        def qseg_index_map(b, h, qi, ki):
            return (b, qi, 0)

        def kvseg_index_map(b, h, qi, ki):
            if causal:
                ki = lax.select(
                    below_or_on_diag(qi, block_q, ki, block_k), ki, 0
                )
            return (b, 0, ki)

        in_specs += [
            pl.BlockSpec((1, block_q, 1), qseg_index_map),
            pl.BlockSpec((1, 1, block_k), kvseg_index_map),
        ]
        inputs += [q_seg, kv_seg]

    out_shape = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, q_len, NUM_LANES), jnp.float32),
    )
    o, lse_rep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), q_index_map),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * heads * q_len * kv_len_pad * head_dim
            // (2 if causal else 1),
            transcendentals=batch * heads * q_len * kv_len_pad,
            bytes_accessed=(
                q.size * q.dtype.itemsize
                + k.size * k.dtype.itemsize
                + v.size * v.dtype.itemsize
                + q.size * q.dtype.itemsize
            ),
        ),
        interpret=resolve_interpret(interpret),
        debug=debug,
    )(*inputs)
    return o, lse_rep
