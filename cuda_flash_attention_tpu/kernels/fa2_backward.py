"""Pallas FlashAttention-2 backward kernels.

TPU-native redesign of the reference CUDA FA2 backward
(/root/reference/kernels/f-attn2-backward.cu:34-339 and its fp16-SHM twin):
the reference grids over KV tiles and accumulates dQ across blocks with a
global atomicAdd (f-attn2-backward.cu:269-300).  Pallas has no cross-block
atomics — and atomics would make gradients non-deterministic — so the TPU
design splits the pass into TWO kernels, each owning its output tile
exclusively (SURVEY.md §7 "hard parts"):

  * dKV kernel: grid (B, H, KV-blocks, Q-blocks), Q innermost; accumulates
    dK, dV in VMEM scratch and writes them once at the last Q block
    (replaces the reference's in-SHM dK accumulation, :303-338).
  * dQ kernel: grid (B, H, Q-blocks, KV-blocks), KV innermost; accumulates
    dQ in VMEM scratch (replaces the atomicAdd).

Both recompute P = exp(QK^T * scale - lse) from the saved logsumexp exactly
as the reference does (:151-183), and consume the precomputed
D_i = rowsum(dO * O) (reference D_computation_reduction_kernel, :342-380;
here a fused XLA reduction — see attention.py).

Gradient algebra (identical to the reference, :219-323):
  dV = P^T dO
  dP = dO V^T
  dS = P * (dP - D) * sm_scale
  dQ = dS K       dK = dS^T Q
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
    NUM_LANES,
    below_or_on_diag,
    build_block_mask,
    mxu_dot_out,
    mxu_dot_ta_out,
    mxu_dot_tb,
    resolve_interpret,
    tile_cast,
    within_window,
)
from cuda_flash_attention_tpu.kernels.fa2_forward import bf16_vpu_chain

# Contract dim 0 of both operands: A^T @ B without materializing a transpose.
_TRANS_A_DIMS = (((0,), (0,)), ((), ()))


def _compute_p_ds(q, k, v, do, lse, di, *, sm_scale, mask, mask_value, tile_dtype):
    """Shared recompute: P from logsumexp, then the UNSCALED dS.

    VPU economy (same scheme as the forward): sm_scale*log2(e) is folded into
    the Q tile ([block_q, D] multiply) so the per-tile [block_q, block_k]
    score scaling disappears and exp becomes the VPU-native exp2; dS is left
    unscaled — callers fold sm_scale into their STORE epilogue instead
    (dq *= sm_scale; dk *= LN2 because its Q operand carries the extra LOG2E):
        dq = sm_scale * (ds_u @ k)        = sm_scale * dq_accum
        dk = sm_scale * (ds_u^T @ q_raw)  = LN2 * (ds_u^T @ q_scaled)-accum
    Returns (p, ds_unscaled, q_scaled) in compute precision.

    bf16-tile path (the production train path) adds one more VPU saving —
    the bf16 chain: the S^2-element exp2 and the ds multiply run in bf16
    itself (the matmuls need p/ds in bf16 anyway, so the separate downcast
    passes collapse into the half-width chain; measured 3.92 -> 3.85 ms at
    Stress-1).  Precision: bf16 t carries <= 2^-9 |t| ln2 relative error
    into p, largest where p is tiny and its absolute contribution to dV/dK
    vanishes — inside the bf16-tile grad budget (tests: 5e-2).

    (A retired round-3 variant also folded the lse/di subtracts onto the
    matmuls' idle contraction lanes — zero measured effect at two block
    optima, deleted with its CFA_BWD_STAT_FOLD knob.)

    fp16 is storage-rounding emulation (compute stays fp32) and keeps the
    fp32 chain; the fp32-parity path keeps the lane-packed 2-pass
    emulation."""
    c = sm_scale * LOG2E
    q_s = q.astype(jnp.float32) * c
    q_s = q_s.astype(q.dtype) if tile_dtype is None else tile_cast(q_s, tile_dtype)
    k = tile_cast(k, tile_dtype)
    bf16_chain = bf16_vpu_chain(
        tile_dtype, jnp.float32, q.shape[0] * k.shape[0]
    )
    do_c = tile_cast(do, tile_dtype)
    v_c = tile_cast(v, tile_dtype)
    s = mxu_dot_tb(q_s, k)  # log2-domain scores
    # lse/di are lane-replicated; a single-lane broadcast beats a
    # lane-tile.  P = exp2(S2 - lse*log2e): rows already normalized
    # (lse = log(l) + m).
    t = s - (lse[:, :1] * LOG2E)
    dpd = mxu_dot_tb(do_c, v_c) - di[:, :1]
    if mask is not None:
        t += jnp.where(mask, 0.0, mask_value)
    if bf16_chain:
        t = t.astype(jnp.bfloat16)
        dpd = dpd.astype(jnp.bfloat16)
    p = jnp.exp2(t)
    if mask is not None:
        # Exact zero on masked entries: fully-masked rows (segment ids) have
        # a garbage lse, and exp(s - lse) there would pollute dK/dV sums.
        p = jnp.where(mask, p, jnp.zeros((), p.dtype))
    ds = p * dpd
    return p, ds, q_s


def _fa2_bwd_fused_kernel(
    *refs,
    sm_scale, causal, mask_value, kv_len,
    block_q, block_k, num_q_blocks, tile_dtype, mask_kv_tail, kv_groups,
    has_segments, scale_dq_in_kernel=False, window=None, sinks=0,
    fold_di=False,
):
    """dK/dV accumulation + per-KV-slice dQ partial in ONE recompute.

    ``fold_di``: the stat input carries O instead of the precomputed
    D_i = rowsum(dO*O), and D_i is reduced in-kernel — the separate XLA
    preamble pass (a full read of dO+O plus a di round trip, ~90 us at
    Stress-1) disappears; the in-cell rowsum is ~1000x smaller than the
    cell's matmuls.  The reference pays a whole launch for this
    (D_computation_reduction_kernel, f-attn2-backward.cu:342-380).

    The standalone dQ kernel re-derives S and dP from scratch — 2 of its 3
    matmuls duplicate work this kernel already does.  Emitting
    dq_part[kv_slice] here (each grid cell owns its output block; an XLA
    sum over the kv_slice axis finishes dQ) trades that recompute for one
    extra dq-sized HBM round trip per KV slice — a large net win whenever
    the sequence has more than one KV block.  This is also the
    deterministic replacement for the reference's cross-block atomicAdd dQ
    (f-attn2-backward.cu:269-300): partial sums land in disjoint memory and
    reduce in a fixed order."""
    if has_segments:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, stat_ref, qseg_ref, kvseg_ref,
         dk_ref, dv_ref, dq_part_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, stat_ref,
         dk_ref, dv_ref, dq_part_ref, dk_scr, dv_scr) = refs
        qseg_ref = kvseg_ref = None
    kv_idx = pl.program_id(2)
    inner = pl.program_id(3)
    q_idx = inner % num_q_blocks

    @pl.when(inner == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = below_or_on_diag(q_idx, block_q, kv_idx, block_k)
    if window is not None:
        should_run &= within_window(
            q_idx, block_q, kv_idx, block_k, window, sinks
        )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        if fold_di:
            di = jnp.sum(
                do.astype(jnp.float32) * stat_ref[0, 0].astype(jnp.float32),
                axis=-1,
            )[:, None]
        else:
            di = stat_ref[0, 0]
        mask = build_block_mask(
            q_idx, kv_idx, block_q, block_k,
            causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kvseg_ref[0] if has_segments else None,
            window=window, sinks=sinks,
        )
        p, ds, q_s = _compute_p_ds(
            q, k, v, do, lse, di,
            sm_scale=sm_scale, mask=mask, mask_value=mask_value,
            tile_dtype=tile_dtype,
        )
        do_c = tile_cast(do, tile_dtype)
        k_c = tile_cast(k, tile_dtype)
        p_c = tile_cast(p, tile_dtype).astype(do_c.dtype)
        ds_c = tile_cast(ds, tile_dtype).astype(q_s.dtype)
        # 2-pass lane-packed emulation: the measured grad error is set by
        # the P recompute, not these output matmuls (on-chip A/B, round 4:
        # 3-pass "exact" 14.49 ms err 3.03e-5 vs 2-pass 9.67 ms err
        # 3.00e-5 at Stress-1) — the extra passes bought nothing.
        dv_scr[...] += mxu_dot_ta_out(p_c, do_c)
        # q_s carries sm_scale*LOG2E; the store epilogue divides it back out.
        dk_scr[...] += mxu_dot_ta_out(ds_c, q_s)
        # dQ partial for this (kv block, q block): dS @ K — S and dP were
        # already in registers, so this is the only extra MXU pass.  Unscaled
        # (ds is unscaled); with several KV slices the wrapper folds sm_scale
        # into the XLA partial-sum, but a SINGLE slice is final — scale+cast
        # here so the wrapper's sum op (a full dq-sized f32 HBM round trip)
        # disappears.
        dq_blk = mxu_dot_out(ds_c, k_c)
        if scale_dq_in_kernel:
            dq_blk = dq_blk * sm_scale
        dq_part_ref[0, 0, 0] = dq_blk.astype(dq_part_ref.dtype)

    if causal or window is not None:
        @pl.when(jnp.logical_not(should_run))
        def _zero_dq():
            # Every (kv, q) cell owns a dq_part block; skipped above-diagonal
            # cells must still zero theirs for the reduction.
            dq_part_ref[0, 0, 0] = jnp.zeros(
                dq_part_ref.shape[3:], dq_part_ref.dtype
            )

    @pl.when(inner == kv_groups * num_q_blocks - 1)
    def _store():
        # dk accumulated against q*(sm_scale*LOG2E); true dk = sm_scale *
        # ds^T q_raw = LN2 * accum — one scalar multiply at store time.
        dk_ref[0, 0] = (dk_scr[...] * LN2).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _fa2_bwd_dkv_kernel(
    *refs,
    sm_scale, causal, mask_value, kv_len,
    block_q, block_k, num_q_blocks, tile_dtype, mask_kv_tail, kv_groups,
    has_segments, window=None, sinks=0, q_span=None,
):
    if has_segments:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, qseg_ref, kvseg_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dk_ref, dv_ref, dk_scr, dv_scr) = refs
        qseg_ref = kvseg_ref = None
    kv_idx = pl.program_id(2)
    # Innermost dim sweeps (query-head group g, Q block qi): dK/dV for one
    # KV head accumulate contributions from ALL query heads in its group
    # before the single store (kernel-native GQA).
    inner = pl.program_id(3)
    span_overflow = None
    if q_span is not None:
        # Compact window grid: only ~window/block_q Q blocks are live per
        # KV block; the span starts at the diagonal Q block.  Near the end
        # of the sequence the span sticks out past the last Q block — those
        # slots clamp their prefetch and are masked dead here.
        s = inner % q_span
        qu = (kv_idx * block_k) // block_q + s
        q_idx = jnp.minimum(qu, num_q_blocks - 1)
        span_overflow = qu > num_q_blocks - 1
        inner_last = kv_groups * q_span - 1
    else:
        q_idx = inner % num_q_blocks
        inner_last = kv_groups * num_q_blocks - 1

    @pl.when(inner == 0)
    def _init():
        dk_scr[...] = jnp.zeros(dk_scr.shape, jnp.float32)
        dv_scr[...] = jnp.zeros(dv_scr.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = below_or_on_diag(q_idx, block_q, kv_idx, block_k)
    if window is not None:
        should_run &= within_window(
            q_idx, block_q, kv_idx, block_k, window, sinks
        )
    if span_overflow is not None:
        should_run &= jnp.logical_not(span_overflow)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        di = di_ref[0, 0]
        mask = build_block_mask(
            q_idx, kv_idx, block_q, block_k,
            causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kvseg_ref[0] if has_segments else None,
            window=window, sinks=sinks,
        )
        p, ds, q_s = _compute_p_ds(
            q, k, v, do, lse, di,
            sm_scale=sm_scale, mask=mask, mask_value=mask_value,
            tile_dtype=tile_dtype,
        )
        # dV += P^T dO ;  dK += dS^T Q_scaled   (contract over the Q rows)
        do_c = tile_cast(do, tile_dtype)
        p_c = tile_cast(p, tile_dtype).astype(do_c.dtype)
        ds_c = tile_cast(ds, tile_dtype).astype(q_s.dtype)
        dv_scr[...] += mxu_dot_ta_out(p_c, do_c)
        dk_scr[...] += mxu_dot_ta_out(ds_c, q_s)

    @pl.when(inner == inner_last)
    def _store():
        dk_ref[0, 0] = (dk_scr[...] * LN2).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _fa2_bwd_dq_kernel(
    *refs,
    sm_scale, causal, mask_value, kv_len,
    block_q, block_k, num_kv_blocks, tile_dtype, mask_kv_tail,
    has_segments, window=None, sinks=0, window_span=None,
):
    if has_segments:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, qseg_ref, kvseg_ref,
         dq_ref, dq_scr) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref,
         dq_ref, dq_scr) = refs
        qseg_ref = kvseg_ref = None
    q_idx = pl.program_id(2)
    kv_prog = pl.program_id(3)
    if window_span is not None:
        # Compact window grid (see fa2_forward): span-relative kv index,
        # last slot anchored at the diagonal block.
        diag = (q_idx * block_q + block_q - 1) // block_k
        kv_idx = jnp.maximum(diag - (window_span - 1), 0) + kv_prog
        last_prog = window_span - 1
    else:
        kv_idx = kv_prog
        last_prog = num_kv_blocks - 1

    @pl.when(kv_prog == 0)
    def _init():
        dq_scr[...] = jnp.zeros(dq_scr.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = below_or_on_diag(q_idx, block_q, kv_idx, block_k)
    if window is not None:
        should_run &= within_window(
            q_idx, block_q, kv_idx, block_k, window, sinks
        )

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0]
        di = di_ref[0, 0]
        mask = build_block_mask(
            q_idx, kv_idx, block_q, block_k,
            causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kvseg_ref[0] if has_segments else None,
            window=window, sinks=sinks,
        )
        _, ds, _ = _compute_p_ds(
            q, k, v, do, lse, di,
            sm_scale=sm_scale, mask=mask, mask_value=mask_value,
            tile_dtype=tile_dtype,
        )
        k_c = tile_cast(k, tile_dtype)
        dq_scr[...] += mxu_dot_out(
            tile_cast(ds, tile_dtype).astype(k_c.dtype), k_c
        )

    @pl.when(kv_prog == last_prog)
    def _store():
        # ds was unscaled; fold sm_scale in once at store time.
        dq_ref[0, 0] = (dq_scr[...] * sm_scale).astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "kv_len",
        "tile_dtype", "kv_groups", "window", "sinks", "interpret",
        "debug",
    ),
)
def fa2_backward_dkv_aligned(
    q, k, v, do, lse_rep, di_rep,
    q_seg=None,   # [B, Sq_pad, 1] int32
    kv_seg=None,  # [B, 1, Skv_pad] int32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    tile_dtype=None,
    kv_groups: int = 1,
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
    debug: bool = False,
):
    """dK, dV. lse_rep/di_rep are stat columns [B, Hq, Sq_pad, 1] fp32
    (lane-replicated [.., NUM_LANES] also accepted).

    With ``kv_groups`` > 1 the grid runs one cell per KV head and sweeps the
    group's query heads in the innermost dim, accumulating the group's dK/dV
    in VMEM scratch (the GQA gradient sum) before one store."""
    batch, heads, q_len, head_dim = q.shape
    kv_heads = k.shape[1]
    assert kv_heads * kv_groups == heads
    if window is not None:
        # causal: standard sliding window (>= 1); causal=False: recency
        # band whose offset may be <= 0 (ring shard decomposition).
        assert (not causal) or window >= 1
    kv_len_pad = k.shape[2]
    num_q_blocks = q_len // block_q
    # Compact window grid (forward twin, see fa2_forward): the inner Q
    # sweep covers only the live span per KV block, anchored at the
    # diagonal Q block.  Slots past the last Q block clamp their prefetch
    # and are masked dead in-kernel.
    q_span = None
    if window is not None and causal and sinks == 0 and q_len == kv_len_pad:
        span = (block_k + window - 2) // block_q + 2
        if span < num_q_blocks:
            q_span = span
    inner_n = kv_groups * (q_span if q_span is not None else num_q_blocks)
    grid = (batch, kv_heads, kv_len_pad // block_k, inner_n)

    def _q_clamp(qi, ki):
        """Dead Q blocks (above-diagonal, or past the sliding window for
        this KV block) redirect their prefetch to the diagonal Q block —
        always live under both skips."""
        live = below_or_on_diag(qi, block_q, ki, block_k)
        if window is not None:
            live &= within_window(qi, block_q, ki, block_k, window, sinks)
            diag = (ki * block_k) // block_q
        else:
            diag = 0
        return lax.select(live, qi, diag)

    def _inner_q(ki, inner):
        if q_span is not None:
            qi = (ki * block_k) // block_q + inner % q_span
            return jnp.minimum(qi, num_q_blocks - 1)
        qi = inner % num_q_blocks
        if causal:
            qi = _q_clamp(qi, ki)
        return qi

    def qo_index_map(b, hk, ki, inner):
        g = inner // (q_span if q_span is not None else num_q_blocks)
        return (b, hk * kv_groups + g, _inner_q(ki, inner), 0)

    def kv_index_map(b, hk, ki, inner):
        return (b, hk, ki, 0)

    has_segments = q_seg is not None
    kernel = functools.partial(
        _fa2_bwd_dkv_kernel,
        sm_scale=sm_scale,
        causal=causal,
        mask_value=DEFAULT_MASK_VALUE,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_q_blocks=num_q_blocks,
        tile_dtype=tile_dtype,
        mask_kv_tail=(kv_len != kv_len_pad),
        kv_groups=kv_groups,
        has_segments=has_segments,
        window=window,
        sinks=sinks,
        q_span=q_span,
    )
    qo_spec = pl.BlockSpec((1, 1, block_q, head_dim), qo_index_map)
    kv_spec = pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map)
    stat_spec = pl.BlockSpec((1, 1, block_q, lse_rep.shape[-1]), qo_index_map)
    in_specs = [qo_spec, kv_spec, kv_spec, qo_spec, stat_spec, stat_spec]
    inputs = [q, k, v, do, lse_rep, di_rep]
    if has_segments:
        def qseg_index_map(b, hk, ki, inner):
            return (b, _inner_q(ki, inner), 0)

        def kvseg_index_map(b, hk, ki, inner):
            return (b, 0, ki)

        in_specs += [
            pl.BlockSpec((1, block_q, 1), qseg_index_map),
            pl.BlockSpec((1, 1, block_k), kvseg_index_map),
        ]
        inputs += [q_seg, kv_seg]
    dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
            pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, head_dim), jnp.float32),
            pltpu.VMEM((block_k, head_dim), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # Large-block configs carry ~20+ MB of fp32 score/ds tiles; the
            # default 16 MB scoped-vmem cap rejects them (v5e has 128 MB).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
        debug=debug,
    )(*inputs)
    return dk, dv


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "kv_len",
        "tile_dtype", "kv_groups", "window", "sinks", "interpret",
        "debug",
    ),
)
def fa2_backward_fused_aligned(
    q, k, v, do, lse_rep, di_rep=None,
    q_seg=None,   # [B, Sq_pad, 1] int32
    kv_seg=None,  # [B, 1, Skv_pad] int32
    *,
    o=None,       # pass O INSTEAD of di_rep to fold the D_i reduction in
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    tile_dtype=None,
    kv_groups: int = 1,
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
    debug: bool = False,
):
    """One-kernel backward: returns (dQ, dK, dV).  dK/dV accumulate in VMEM
    scratch over the inner (group, Q-block) sweep; dQ comes out as per-KV-
    slice partials reduced by XLA (see _fa2_bwd_fused_kernel docstring)."""
    batch, heads, q_len, head_dim = q.shape
    kv_heads = k.shape[1]
    assert kv_heads * kv_groups == heads
    if window is not None:
        # causal: standard sliding window (>= 1); causal=False: recency
        # band whose offset may be <= 0 (ring shard decomposition).
        assert (not causal) or window >= 1
    kv_len_pad = k.shape[2]
    num_q_blocks = q_len // block_q
    num_kv_blocks = kv_len_pad // block_k
    grid = (batch, kv_heads, num_kv_blocks, kv_groups * num_q_blocks)
    single_slice = num_kv_blocks == 1

    def _q_clamp(qi, ki):
        # Dead Q blocks prefetch the diagonal (always-live) Q block.
        live = below_or_on_diag(qi, block_q, ki, block_k)
        if window is not None:
            live &= within_window(qi, block_q, ki, block_k, window, sinks)
            diag = (ki * block_k) // block_q
        else:
            diag = 0
        return lax.select(live, qi, diag)

    def qo_index_map(b, hk, ki, inner):
        g = inner // num_q_blocks
        qi = inner % num_q_blocks
        if causal:
            qi = _q_clamp(qi, ki)
        return (b, hk * kv_groups + g, qi, 0)

    def kv_index_map(b, hk, ki, inner):
        return (b, hk, ki, 0)

    def dq_part_index_map(b, hk, ki, inner):
        # No causal clamp: every cell owns (and writes) its partial block.
        g = inner // num_q_blocks
        qi = inner % num_q_blocks
        return (b, hk * kv_groups + g, ki, qi, 0)

    has_segments = q_seg is not None
    kernel = functools.partial(
        _fa2_bwd_fused_kernel,
        sm_scale=sm_scale,
        causal=causal,
        mask_value=DEFAULT_MASK_VALUE,
        kv_len=kv_len,
        block_q=block_q,
        block_k=block_k,
        num_q_blocks=num_q_blocks,
        tile_dtype=tile_dtype,
        mask_kv_tail=(kv_len != kv_len_pad),
        kv_groups=kv_groups,
        has_segments=has_segments,
        scale_dq_in_kernel=single_slice,
        window=window,
        sinks=sinks,
        fold_di=o is not None,
    )
    assert (o is None) != (di_rep is None), "pass exactly one of o/di_rep"
    qo_spec = pl.BlockSpec((1, 1, block_q, head_dim), qo_index_map)
    kv_spec = pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map)
    stat_spec = pl.BlockSpec((1, 1, block_q, lse_rep.shape[-1]), qo_index_map)
    di_spec = qo_spec if o is not None else stat_spec
    in_specs = [qo_spec, kv_spec, kv_spec, qo_spec, stat_spec, di_spec]
    inputs = [q, k, v, do, lse_rep, di_rep if o is None else o]
    if has_segments:
        def qseg_index_map(b, hk, ki, inner):
            qi = inner % num_q_blocks
            if causal:
                qi = _q_clamp(qi, ki)
            return (b, qi, 0)

        def kvseg_index_map(b, hk, ki, inner):
            return (b, 0, ki)

        in_specs += [
            pl.BlockSpec((1, block_q, 1), qseg_index_map),
            pl.BlockSpec((1, 1, block_k), kvseg_index_map),
        ]
        inputs += [q_seg, kv_seg]
    dk, dv, dq_part = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
            pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
            pl.BlockSpec((1, 1, 1, block_q, head_dim), dq_part_index_map),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_k, head_dim), jnp.float32),
            pltpu.VMEM((block_k, head_dim), jnp.float32),
        ],
        out_shape=(
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(
                (batch, heads, num_kv_blocks, q_len, head_dim),
                q.dtype if single_slice else jnp.float32,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # Large-block configs carry ~20+ MB of fp32 score/ds tiles; the
            # default 16 MB scoped-vmem cap rejects them (v5e has 128 MB).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
        debug=debug,
    )(*inputs)
    if single_slice:
        dq = dq_part[:, :, 0]  # already scaled + cast in-kernel; free reshape
    else:
        dq = (jnp.sum(dq_part, axis=2) * sm_scale).astype(q.dtype)
    return dq, dk, dv


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "kv_len",
        "tile_dtype", "kv_groups", "window", "sinks", "interpret",
        "debug",
    ),
)
def fa2_backward_dq_aligned(
    q, k, v, do, lse_rep, di_rep,
    q_seg=None,   # [B, Sq_pad, 1] int32
    kv_seg=None,  # [B, 1, Skv_pad] int32
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    kv_len: int,
    tile_dtype=None,
    kv_groups: int = 1,
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
    debug: bool = False,
):
    """dQ — grid over Q blocks, replacing the reference's cross-block
    atomicAdd (f-attn2-backward.cu:269-300) with exclusive per-block
    accumulation; gradients are bitwise deterministic.  ``kv_groups`` maps
    query head h onto KV head h // kv_groups (kernel-native GQA)."""
    batch, heads, q_len, head_dim = q.shape
    if window is not None:
        # causal: standard sliding window (>= 1); causal=False: recency
        # band whose offset may be <= 0 (ring shard decomposition).
        assert (not causal) or window >= 1
    kv_len_pad = k.shape[2]
    num_kv_blocks = kv_len_pad // block_k
    # Compact window grid (see fa2_forward): kv grid dim = live span only.
    window_span = None
    if window is not None and causal and sinks == 0 and q_len == kv_len_pad:
        span = (block_q + window - 2) // block_k + 2
        if span < num_kv_blocks:
            window_span = span
    grid = (
        batch, heads, q_len // block_q,
        window_span if window_span is not None else num_kv_blocks,
    )

    def _kv_clamp(qi, ki):
        # Dead KV blocks prefetch the oldest in-window live block instead.
        live = below_or_on_diag(qi, block_q, ki, block_k)
        if window is None:
            return lax.select(live, ki, 0)
        live &= within_window(qi, block_q, ki, block_k, window, sinks)
        if sinks > 0:
            return lax.select(live, ki, 0)  # block 0 is a live sink block
        lo = jnp.maximum(0, (qi * block_q - (window - 1)) // block_k)
        return lax.select(live, ki, lo)

    def _span_block(qi, ki):
        diag = (qi * block_q + block_q - 1) // block_k
        return jnp.maximum(diag - (window_span - 1), 0) + ki

    def qo_index_map(b, h, qi, ki):
        return (b, h, qi, 0)

    def kv_index_map(b, h, qi, ki):
        if window_span is not None:
            ki = _span_block(qi, ki)
        elif causal:
            ki = _kv_clamp(qi, ki)
        return (b, h // kv_groups, ki, 0)

    has_segments = q_seg is not None
    kernel = functools.partial(
        _fa2_bwd_dq_kernel,
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
        window=window,
        sinks=sinks,
        window_span=window_span,
    )
    qo_spec = pl.BlockSpec((1, 1, block_q, head_dim), qo_index_map)
    kv_spec = pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map)
    stat_spec = pl.BlockSpec((1, 1, block_q, lse_rep.shape[-1]), qo_index_map)
    in_specs = [qo_spec, kv_spec, kv_spec, qo_spec, stat_spec, stat_spec]
    inputs = [q, k, v, do, lse_rep, di_rep]
    if has_segments:
        def qseg_index_map(b, h, qi, ki):
            return (b, qi, 0)

        def kvseg_index_map(b, h, qi, ki):
            if window_span is not None:
                ki = _span_block(qi, ki)
            elif causal:
                ki = _kv_clamp(qi, ki)
            return (b, 0, ki)

        in_specs += [
            pl.BlockSpec((1, block_q, 1), qseg_index_map),
            pl.BlockSpec((1, 1, block_k), kvseg_index_map),
        ]
        inputs += [q_seg, kv_seg]
    dq = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, head_dim), qo_index_map),
        scratch_shapes=[pltpu.VMEM((block_q, head_dim), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # Large-block configs carry ~20+ MB of fp32 score/ds tiles; the
            # default 16 MB scoped-vmem cap rejects them (v5e has 128 MB).
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=resolve_interpret(interpret),
        debug=debug,
    )(*inputs)
    return dq
