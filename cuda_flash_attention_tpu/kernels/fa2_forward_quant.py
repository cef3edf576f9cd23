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
    kv_storage_cast,
    storage_cast,
    within_window,
)
from cuda_flash_attention_tpu.quant.qtensor import QuantizedTensor, quantize_kv


def _fa2_fwd_quant_kernel(
    *refs,
    # ref order: q [1,1,bq,D], k_vals [1,1,bk,D] int8/fp8,
    # k_scales [1,1,1,bk] f32, v_vals, v_scales,
    # (q_seg [1,bq,1], kv_seg [1,1,bk] when has_segments,)
    # o [1,1,bq,D], lse [1,1,bq,1], scratch m/l/acc.
    sm_scale: float,
    causal: bool,
    mask_value: float,
    kv_len: int,
    block_q: int,
    block_k: int,
    num_kv_blocks: int,
    compute_dtype,
    mask_kv_tail: bool,
    has_segments: bool,
    window=None,
):
    if has_segments:
        (q_ref, k_ref, k_scale_ref, v_ref, v_scale_ref, qseg_ref, kvseg_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs
    else:
        (q_ref, k_ref, k_scale_ref, v_ref, v_scale_ref,
         o_ref, lse_ref, m_scr, l_scr, acc_scr) = refs
        qseg_ref = kvseg_ref = None
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = below_or_on_diag(q_idx, block_q, kv_idx, block_k)
    if window is not None:
        should_run &= within_window(q_idx, block_q, kv_idx, block_k, window)

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
        k = kv_storage_cast(
            k_ref[0, 0], q_ref.shape[-1], compute_dtype
        )  # int4 KV unpacks in-register (split-half nibbles)
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
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kvseg_ref[0] if has_segments else None,
            window=window,
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
        v = kv_storage_cast(v_ref[0, 0], q_ref.shape[-1], compute_dtype)
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
        "compute_dtype", "kv_groups", "window", "interpret", "debug",
    ),
)
def fa2_forward_quant_aligned(
    q,         # [B, Hq, Sq_pad, D]
    k_vals,    # [B, Hq // kv_groups, Skv_pad, D] int8/fp8
    k_scales,  # [B, Hq // kv_groups, 1, Skv_pad] f32
    v_vals,
    v_scales,
    q_seg=None,   # [B, Sq_pad, 1] int32
    kv_seg=None,  # [B, 1, Skv_pad] int32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    compute_dtype=jnp.bfloat16,
    kv_groups: int = 1,
    window: int | None = None,
    interpret=None,
    debug: bool = False,
):
    """Block-aligned quantized-KV FA2 forward. Returns (O, lse_rep).

    ``kv_groups`` is kernel-native GQA exactly as in the base forward
    (fa2_forward.py): query head h streams quantized KV head h // kv_groups
    straight from HBM — the 1-byte KV traffic stays 1x per KV head."""
    batch, heads, q_len, head_dim = q.shape
    kv_len_pad = k_vals.shape[2]
    kv_dim = k_vals.shape[-1]  # head_dim, or head_dim//2 for packed int4
    assert q_len % block_q == 0 and kv_len_pad % block_k == 0
    assert k_vals.shape[1] * kv_groups == heads
    if window is not None:
        # causal: standard sliding window (>= 1); causal=False: recency
        # band whose offset may be <= 0 (ring shard decomposition).
        assert (not causal) or window >= 1
    num_kv_blocks = kv_len_pad // block_k
    grid = (batch, heads, q_len // block_q, num_kv_blocks)

    def _kv_clamp(qi, ki):
        # Dead blocks (above-diagonal or behind the window) prefetch the
        # oldest in-window live block instead (see fa2_forward.py).
        live = below_or_on_diag(qi, block_q, ki, block_k)
        if window is None:
            return lax.select(live, ki, 0)
        live &= within_window(qi, block_q, ki, block_k, window)
        lo = jnp.maximum(0, (qi * block_q - (window - 1)) // block_k)
        return lax.select(live, ki, lo)

    def q_index_map(b, h, qi, ki):
        return (b, h, qi, 0)

    def kv_index_map(b, h, qi, ki):
        if causal:
            ki = _kv_clamp(qi, ki)
        return (b, h // kv_groups, ki, 0)

    def kv_scale_index_map(b, h, qi, ki):
        if causal:
            ki = _kv_clamp(qi, ki)
        return (b, h // kv_groups, 0, ki)

    has_segments = q_seg is not None
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
        has_segments=has_segments,
        window=window,
    )

    in_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
        pl.BlockSpec((1, 1, block_k, kv_dim), kv_index_map),
        pl.BlockSpec((1, 1, 1, block_k), kv_scale_index_map),
        pl.BlockSpec((1, 1, block_k, kv_dim), kv_index_map),
        pl.BlockSpec((1, 1, 1, block_k), kv_scale_index_map),
    ]
    inputs = [q, k_vals, k_scales, v_vals, v_scales]
    if has_segments:
        def qseg_index_map(b, h, qi, ki):
            return (b, qi, 0)

        def kvseg_index_map(b, h, qi, ki):
            if causal:
                ki = _kv_clamp(qi, ki)
            return (b, 0, ki)

        in_specs += [
            pl.BlockSpec((1, block_q, 1), qseg_index_map),
            pl.BlockSpec((1, 1, block_k), kvseg_index_map),
        ]
        inputs += [q_seg, kv_seg]

    out_shape = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, q_len, 1), jnp.float32),
    )
    o, lse_rep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
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
    )(*inputs)
    return o, lse_rep


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


def _validate_quant_shapes(q, k_q: QuantizedTensor, v_q: QuantizedTensor):
    """Shape/head-count validation — the quantized twin of
    attention._validate_shapes: same checks, plus the scale-layout contract
    (per-token scales, [B, Hkv, Skv, 1])."""
    if q.ndim != 4 or k_q.values.ndim != 4 or v_q.values.ndim != 4:
        raise ValueError(
            f"q/k/v must be [batch, heads, seq, head_dim]; got {q.shape}, "
            f"{k_q.values.shape}, {v_q.values.shape}"
        )
    if k_q.values.shape != v_q.values.shape:
        raise ValueError(
            f"k/v shape mismatch: {k_q.values.shape} vs {v_q.values.shape}"
        )
    kv_dim = k_q.values.shape[3]
    packed_ok = getattr(k_q, "bits", 8) == 4 and kv_dim * 2 == q.shape[3]
    if q.shape[0] != k_q.values.shape[0] or (
        kv_dim != q.shape[3] and not packed_ok
    ):
        raise ValueError(
            f"q and k must agree on batch/head_dim (packed int4 KV stores "
            f"head_dim//2): {q.shape} vs {k_q.values.shape}"
        )
    if q.shape[1] % k_q.values.shape[1] != 0:
        raise ValueError(
            f"GQA requires query heads ({q.shape[1]}) to be a multiple of "
            f"KV heads ({k_q.values.shape[1]})"
        )
    for name, t in (("k", k_q), ("v", v_q)):
        want = (*t.values.shape[:3], 1)
        if t.scales.shape != want:
            raise ValueError(
                f"{name} scales must be per-token {want} (quantize_kv's "
                f"axis=-1 layout); got {t.scales.shape}"
            )


def flash_attention_quantized_kv_with_lse(
    q,                      # [B, Hq, Sq, D]
    k_q: QuantizedTensor,   # values [B, Hkv, Skv, D], scales [B, Hkv, Skv, 1]
    v_q: QuantizedTensor,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 1024,
    compute_dtype=jnp.bfloat16,
    q_segment_ids=None,   # [B, Sq] int32 — sequence-packing segment ids
    kv_segment_ids=None,  # [B, Skv] int32
    window: int | None = None,
    interpret=None,
):
    """Quantized-KV FA2 forward returning (O, logsumexp [B, H, Sq] fp32) —
    the partial-attention form the quantized ring (parallel/ring.py) merges
    across ring steps.  GQA is kernel-native (k/v may carry fewer heads);
    segment ids mask cross-sequence attention exactly as in the base
    kernel."""
    from cuda_flash_attention_tpu.kernels.attention import (
        _pack_segments,
        _validate_segments,
    )

    from cuda_flash_attention_tpu.kernels.attention import _normalize_window

    _validate_quant_shapes(q, k_q, v_q)
    _validate_segments(q_segment_ids, kv_segment_ids, q, k_q.values)
    window = _normalize_window(window, causal, q.shape[2], k_q.values.shape[2])
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    q_len, kv_len = q.shape[2], k_q.values.shape[2]
    kv_groups = q.shape[1] // k_q.values.shape[1]

    segs = _pack_segments(q_segment_ids, kv_segment_ids, q, k_q.values)
    q_seg, kv_seg = segs if segs is not None else (None, None)
    q_pad = pad_to_block(q, 2, MIN_BLOCK)
    k_vals = pad_to_block(k_q.values, 2, MIN_BLOCK)
    v_vals = pad_to_block(v_q.values, 2, MIN_BLOCK)
    # [B, H, S, 1] -> [B, H, 1, S] lane-major scale rows.
    k_scales = pad_to_block(k_q.scales.transpose(0, 1, 3, 2), 3, MIN_BLOCK)
    v_scales = pad_to_block(v_q.scales.transpose(0, 1, 3, 2), 3, MIN_BLOCK)
    if q_seg is not None:
        # _pack_segments pads by the (possibly sub-128) dtype quantum;
        # quantized KV always pads to the full block grid.
        q_seg = pad_to_block(q_seg, 1, MIN_BLOCK)
        kv_seg = pad_to_block(kv_seg, 2, MIN_BLOCK)

    o, lse_col = fa2_forward_quant_aligned(
        q_pad, k_vals, k_scales, v_vals, v_scales, q_seg, kv_seg,
        causal=causal, sm_scale=float(sm_scale),
        block_q=fit_block(block_q, q_pad.shape[2]),
        block_k=fit_block(block_k, k_vals.shape[2]),
        kv_len=kv_len, compute_dtype=compute_dtype, kv_groups=kv_groups,
        window=window, interpret=interpret,
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
