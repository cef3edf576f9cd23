"""Pallas FA2 forward with INT8/FP8-quantized K/V and fused dequantization.

North-star extension of the reference's reduced-precision kernel family
(/root/reference/kernels/kernel_fa2_optimized_f16.cu keeps fp16 tiles in SHM
while HBM stays fp32; SURVEY.md §2 maps that switch to "INT8/FP8 KV dequant
fused into the matmul" on TPU).  K and V live in HBM as int8 / fp8 with one
fp32 scale per (batch, head, position) row; the kernel streams the quantized
blocks into VMEM (4x less HBM traffic than fp32) and folds the scales into
the attention algebra instead of materializing dequantized tiles:

    S[i, j] = (Q K_q^T)[i, j] * k_scale[j] * sm_scale     (scale of K row j
                                                           scales S column j)
    O[i, :] += sum_j P[i, j] * v_scale[j] * V_q[j, :]
             = ((P * v_scale) V_q)[i, :]                  (fold into P)

so dequantization costs one [block_q, block_k] VPU multiply per matmul —
no [block_k, D] dequantized tile is ever built.  Softmax statistics stay
fp32 exactly as in the base kernel (fa2_forward.py).

Layout note: scales are carried as [B, H, 1, S] so the per-KV-block tile is
[1, block_k] — lane-major, broadcastable over S's rows on the VPU.
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
    LN2,
    LOG2E,
    MIN_BLOCK,
    NUM_LANES,
    TRANS_B_DIMS,
    below_or_on_diag,
    build_block_mask,
    fit_block,
    matmul_precision,
    pad_to_block,
    resolve_interpret,
    storage_cast,
)
from cuda_flash_attention_tpu.quant.qtensor import QuantizedTensor, quantize_kv


def _fa2_fwd_quant_kernel(
    q_ref,        # [1, 1, block_q, D]     compute dtype
    k_ref,        # [1, 1, block_k, D]     int8 / fp8
    k_scale_ref,  # [1, 1, 1, block_k]     f32
    v_ref,        # [1, 1, block_k, D]     int8 / fp8
    v_scale_ref,  # [1, 1, 1, block_k]     f32
    o_ref,        # [1, 1, block_q, D]
    lse_ref,      # [1, 1, block_q, 1]
    m_scr, l_scr, acc_scr,
    *,
    sm_scale: float,
    causal: bool,
    mask_value: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    compute_dtype,
    mask_kv_tail: bool,
):
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

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
        # sm_scale and the exp->exp2 change of base fold into Q once per
        # block (same scheme as fa2_forward.py); K's per-row dequant scale
        # cannot (it varies per COLUMN of S), so that one multiply stays.
        c = sm_scale * LOG2E
        q = (q_ref[0, 0].astype(jnp.float32) * c).astype(compute_dtype)
        # int8/fp8 -> compute dtype: a VPU convert (bit surgery for fp8 —
        # storage_cast); the scale itself is folded into S below, so no
        # dequantized K tile is materialized.
        k = storage_cast(k_ref[0, 0], compute_dtype)
        s = lax.dot_general(
            q, k, TRANS_B_DIMS,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(q.dtype),
        )  # [block_q, block_k], log2-domain after the column scale
        k_scale = k_scale_ref[0, 0]  # [1, block_k]
        s *= k_scale

        mask = build_block_mask(
            q_idx, kv_idx, block_q, block_k,
            causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
        )
        if mask is not None:
            s += jnp.where(mask, 0.0, mask_value)

        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=1)[:, None]
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next[:, :1])
        l_next = alpha * l_prev + jnp.sum(p, axis=1)[:, None]
        m_scr[...] = m_next
        l_scr[...] = l_next

        # Fold V's row scales into P: (P * v_scale) @ V_q == P @ (v_scale * V_q).
        v_scale = v_scale_ref[0, 0]  # [1, block_k]
        p_scaled = (p * v_scale).astype(compute_dtype)
        v = storage_cast(v_ref[0, 0], compute_dtype)
        pv = lax.dot(
            p_scaled, v,
            preferred_element_type=jnp.float32,
            precision=matmul_precision(v.dtype),
        )
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_idx == num_kv_blocks - 1)
    def _store():
        l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse_ref[0, 0] = (
            m_scr[:, :1] * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "kv_len",
        "compute_dtype", "interpret", "debug",
    ),
)
def fa2_forward_quant_aligned(
    q,         # [B, H, Sq_pad, D]
    k_vals,    # [B, H, Skv_pad, D] int8/fp8
    k_scales,  # [B, H, 1, Skv_pad] f32
    v_vals,
    v_scales,
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    compute_dtype=jnp.bfloat16,
    interpret=None,
    debug: bool = False,
):
    """Block-aligned quantized-KV FA2 forward. Returns (O, lse_rep)."""
    batch, heads, q_len, head_dim = q.shape
    kv_len_pad = k_vals.shape[2]
    assert q_len % block_q == 0 and kv_len_pad % block_k == 0
    num_kv_blocks = kv_len_pad // block_k
    grid = (batch, heads, q_len // block_q, num_kv_blocks)

    def q_index_map(b, h, qi, ki):
        return (b, h, qi, 0)

    def kv_index_map(b, h, qi, ki):
        if causal:
            ki = lax.select(below_or_on_diag(qi, block_q, ki, block_k), ki, 0)
        return (b, h, ki, 0)

    def kv_scale_index_map(b, h, qi, ki):
        if causal:
            ki = lax.select(below_or_on_diag(qi, block_q, ki, block_k), ki, 0)
        return (b, h, 0, ki)

    kernel = functools.partial(
        _fa2_fwd_quant_kernel,
        sm_scale=sm_scale,
        causal=causal,
        mask_value=DEFAULT_MASK_VALUE,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_kv_blocks=num_kv_blocks,
        compute_dtype=compute_dtype,
        mask_kv_tail=(kv_len != kv_len_pad),
    )

    out_shape = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, q_len, 1), jnp.float32),
    )
    o, lse_rep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
            pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
            pl.BlockSpec((1, 1, 1, block_k), kv_scale_index_map),
            pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
            pl.BlockSpec((1, 1, 1, block_k), kv_scale_index_map),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
            pl.BlockSpec((1, 1, block_q, 1), q_index_map),
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
                + k_vals.size * k_vals.dtype.itemsize
                + v_vals.size * v_vals.dtype.itemsize
                + k_scales.size * 4 + v_scales.size * 4
                + q.size * q.dtype.itemsize
            ),
        ),
        interpret=resolve_interpret(interpret),
        debug=debug,
    )(q, k_vals, k_scales, v_vals, v_scales)
    return o, lse_rep


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def flash_attention_quantized_kv_with_lse(
    q,                      # [B, H, Sq, D]
    k_q: QuantizedTensor,   # values [B, H, Skv, D], scales [B, H, Skv, 1]
    v_q: QuantizedTensor,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret=None,
):
    """Quantized-KV FA2 forward returning (O, logsumexp [B, H, Sq] fp32) —
    the partial-attention form the quantized ring (parallel/ring.py) merges
    across ring steps."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    q_len, kv_len = q.shape[2], k_q.values.shape[2]

    q_pad = pad_to_block(q, 2, MIN_BLOCK)
    k_vals = pad_to_block(k_q.values, 2, MIN_BLOCK)
    v_vals = pad_to_block(v_q.values, 2, MIN_BLOCK)
    # [B, H, S, 1] -> [B, H, 1, S] lane-major scale rows.
    k_scales = pad_to_block(k_q.scales.transpose(0, 1, 3, 2), 3, MIN_BLOCK)
    v_scales = pad_to_block(v_q.scales.transpose(0, 1, 3, 2), 3, MIN_BLOCK)

    o, lse_col = fa2_forward_quant_aligned(
        q_pad, k_vals, k_scales, v_vals, v_scales,
        causal=causal, sm_scale=float(sm_scale),
        block_q=fit_block(block_q, q_pad.shape[2]),
        block_k=fit_block(block_k, k_vals.shape[2]),
        kv_len=kv_len, compute_dtype=compute_dtype, interpret=interpret,
    )
    return o[:, :, :q_len, :], lse_col[:, :, :q_len, 0]


def flash_attention_quantized_kv(q, k_q, v_q, **kwargs):
    """FA2 forward over a quantized KV cache (inference path; returns O).

    `k_q`/`v_q` come from `quant.quantize_kv` (per-token scales).  HBM reads
    of K/V are 1 byte per element; dequantization is fused into the kernel's
    matmuls (see module docstring).
    """
    o, _ = flash_attention_quantized_kv_with_lse(q, k_q, v_q, **kwargs)
    return o


def flash_attention_int8_kv(q, k, v, **kwargs):
    """Convenience: quantize K/V to int8 on the fly, then attend."""
    k_q, v_q = quantize_kv(k, v, jnp.int8)
    return flash_attention_quantized_kv(q, k_q, v_q, **kwargs)
