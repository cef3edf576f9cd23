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
  warp-shuffle max/sum reductions     VPU lane max; the SUM rides the PV
                                      matmul's idle output lanes (see below)
  fp16-in-SHM variant                 `tile_dtype` parameter: blocks cast to
                                      bf16/fp16 before the matmuls, softmax
                                      stats always fp32 (SURVEY.md §7)
  -FLT_MAX tail padding               zero-pad to block grid + in-kernel mask
  logsumexp = log(l) + m              identical contract
                                      (kernel_fa2_optimized.cu:339-344)

VPU-economy design (profiler-driven, v5e):
  * All softmax algebra runs in the exp2 domain: sm_scale*log2(e) is folded
    into the Q tile ONCE per block ([block_q, D] multiply) instead of
    scaling S per KV tile ([block_q, block_k]), and p/alpha use the VPU's
    native exp2 — the reference instead multiplies every S element
    (kernel_fa2_optimized.cu:169-190).
  * V-augmentation: at head_dim < 128 the PV matmul's output lanes are half
    idle on the 128-wide MXU.  V tiles are augmented with a ones column
    (wrapper-materialized [.., S, 128] with v_aug[..,:,D] = 1), so P @ V_aug
    produces rowsum(P) in lane D for FREE — the l accumulator lives in the
    acc scratch's spare lane and the per-tile VPU sum reduction disappears.

The kernel keeps the FA2 deferred-normalization form: the accumulator is
rescaled only by alpha = exp2(m_prev - m_next) per tile and divided by l once
at the final KV block.
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
    mxu_dot_tb,
    resolve_interpret,
    tile_cast,
    within_window,
)


def use_fold_rowsum(head_dim: int, tile_dtype, in_dtype) -> bool:
    """V-aug rowsum is free only when the PV matmul underfills the MXU's
    output lanes (D < 128) AND the matmul runs a single native bf16 pass —
    fp32 (and the fp16 storage emulation, which computes in fp32) pays per
    output lane in the multi-pass emulation, so widening V to 128 lanes
    would roughly double its PV time."""
    if head_dim >= NUM_LANES:
        return False
    eff = tile_dtype if tile_dtype is not None else in_dtype
    return jnp.dtype(eff) == jnp.dtype(jnp.bfloat16)


# Score tiles below this element count keep the fp32 softmax chain: the
# VPU work is negligible there, and the bf16 chain's ~2^-9 relative noise
# would leak into token-level greedy parity at serving shapes
# (tests/test_decode.py engine-vs-full-forward gate).  512x512 and the
# production blocks (1024x1024+) sit above; padded tiny prefills (<=128^2)
# sit below.
_BF16_CHAIN_MIN_SCORE_ELEMS = 2 ** 18


def bf16_vpu_chain(tile_dtype, in_dtype, score_elems=_BF16_CHAIN_MIN_SCORE_ELEMS):
    """True when the effective matmul dtype is bf16 (native MXU path) and
    the score tile is large: the S^2-element softmax chain (exp2,
    mask-where, ds-style multiplies) then runs in bf16 directly — the
    downstream matmul needs a bf16 operand anyway, so the fp32 exp2 +
    separate downcast pass collapses into one half-width exp2.
    fp32/fp16-emulation paths keep the fp32 chain (their matmul operands
    are fp32).

    ``score_elems`` is the [block_q, block_k] tile size; callers that know
    their tile pass it so sub-threshold tiles keep the fp32 chain (see
    _BF16_CHAIN_MIN_SCORE_ELEMS).

    Unconditional on the bf16 path since round 4: the backward measures a
    1.7% kernel win (3.92 -> 3.85 ms at Stress-1), the forward is neutral
    (1.5514 vs 1.5524 ms) — the former CFA_BF16_VPU_CHAIN A/B knob is
    retired."""
    if score_elems < _BF16_CHAIN_MIN_SCORE_ELEMS:
        return False
    eff = tile_dtype if tile_dtype is not None else in_dtype
    return jnp.dtype(eff) == jnp.dtype(jnp.bfloat16)


def augment_v(v):
    """[B, H, S, D] -> [B, H, S, NUM_LANES] with a ones column at lane D
    (zeros above): P @ V_aug computes rowsum(P) in lane D on the otherwise
    idle MXU output lanes."""
    b, h, s, d = v.shape
    ones = jnp.ones((b, h, s, 1), v.dtype)
    if d + 1 == NUM_LANES:
        return jnp.concatenate([v, ones], axis=-1)
    zeros = jnp.zeros((b, h, s, NUM_LANES - d - 1), v.dtype)
    return jnp.concatenate([v, ones, zeros], axis=-1)


def _rowsum_chunks(head_dim: int, block_k: int, tile_dtype, in_dtype) -> int:
    """In-body KV chunk count for the single-KV fast path.

    At head_dim >= 128 there is no idle MXU output lane for fold-rowsum, so
    `l = rowsum(P)` is an exposed VPU reduction on the QK^T -> exp2 -> PV
    serial chain (~5 us/cell at D=128/S=2048 — docs/ROOFLINE.md).  Splitting
    the KV into TWO chunks inside ONE grid cell lets Mosaic overlap chunk
    i+1's QK^T (MXU) with chunk i's rowsum/exp2 (VPU): measured 0.466 ->
    0.411 ms (147 -> 167 TF) at B4 H8 S2048 D128 bf16 — where the same
    split via the GRID (block_k=1024, scratch round trips + pl.when per
    iteration) measured 0.57 ms.  bf16-only: the fp32 emulation paths are
    MXU-pass-bound, not rowsum-exposed."""
    eff = tile_dtype if tile_dtype is not None else in_dtype
    if (head_dim >= NUM_LANES and block_k >= 2048
            and jnp.dtype(eff) == jnp.dtype(jnp.bfloat16)):
        # Chunk-count sweep on-chip at D=128/S=2048 (round 5): 2 -> 167.1
        # TF, 3 -> 150.0, 4 -> 173.5, 8 -> 159.8.  Four chunks measured
        # only at D=128; D>=256 keeps the measured 2-chunk split.
        if head_dim == NUM_LANES and block_k % 4 == 0:
            return 4
        return 2
    return 1


def _single_kv_attention(
    q_raw, k_raw, v_raw, q_seg, kv_seg, *,
    sm_scale, causal, mask_value, kv_len, block_q, block_k,
    tile_dtype, mask_kv_tail, fold_rowsum, q_idx, out_dtype,
    pre_scaled=False, want_lse=True, window=None, sinks=0,
):
    """Direct (non-online) softmax attention for one [block_q, D] tile whose
    whole KV fits one [block_k, D] tile.  Returns (o, lse_col) — lse is None
    when want_lse=False (inference forward; skips the log/store work)."""
    head_dim = q_raw.shape[-1]
    if pre_scaled:
        q = q_raw
    else:
        c = sm_scale * LOG2E
        q = q_raw.astype(jnp.float32) * c
        q = q.astype(q_raw.dtype) if tile_dtype is None else tile_cast(q, tile_dtype)

    n_chunks = _rowsum_chunks(head_dim, block_k, tile_dtype, q_raw.dtype)
    if n_chunks > 1:
        chunk = block_k // n_chunks
        m_run = jnp.full((q.shape[0], 1), -jnp.inf, jnp.float32)
        l_run = jnp.zeros((q.shape[0], 1), jnp.float32)
        acc = jnp.zeros((q.shape[0], head_dim), jnp.float32)
        for i in range(n_chunks):
            ks = tile_cast(k_raw[i * chunk:(i + 1) * chunk], tile_dtype)
            vs = tile_cast(v_raw[i * chunk:(i + 1) * chunk], tile_dtype)
            s = mxu_dot_tb(q, ks)
            mask = build_block_mask(
                q_idx, i, block_q, chunk,
                causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
                q_seg=q_seg,
                kv_seg=None if kv_seg is None
                else kv_seg[:, i * chunk:(i + 1) * chunk],
                window=window, sinks=sinks,
            )
            if mask is not None:
                s += jnp.where(mask, 0.0, mask_value)
            m_cur = jnp.max(s, axis=1)[:, None]
            m_new = jnp.maximum(m_run, m_cur)
            alpha = jnp.exp2(m_run - m_new)
            t = s - m_new
            if bf16_vpu_chain(tile_dtype, q_raw.dtype, block_q * chunk):
                t = t.astype(jnp.bfloat16)
            p = jnp.exp2(t)
            if mask is not None:
                p = jnp.where(mask, p, jnp.zeros((), p.dtype))
            l_run = (
                alpha * l_run + jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
            )
            pv = mxu_dot_out(
                tile_cast(p, tile_dtype).astype(vs.dtype), vs, exact=True
            )
            acc = acc * alpha + pv
            m_run = m_new
        l_inv = jnp.where(l_run == 0.0, 1.0, 1.0 / l_run)
        o = (acc * l_inv).astype(out_dtype)
        if not want_lse:
            return o, None
        lse = m_run * LN2 + jnp.log(jnp.where(l_run == 0.0, 1.0, l_run))
        return o, lse

    k = tile_cast(k_raw, tile_dtype)
    s = mxu_dot_tb(q, k)
    mask = build_block_mask(
        q_idx, 0, block_q, block_k,
        causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
        q_seg=q_seg, kv_seg=kv_seg, window=window, sinks=sinks,
    )
    if mask is not None:
        s += jnp.where(mask, 0.0, mask_value)
    m = jnp.max(s, axis=1)[:, None]  # [block_q, 1]
    t = s - m
    # This fast path also serves WHOLE-sequence blocks (S <= block_k, incl.
    # the S=2048 headline) where the S^2 chain dominates VPU time — the
    # size gate keeps padded tiny prefills on the fp32 chain.
    if bf16_vpu_chain(tile_dtype, q_raw.dtype, block_q * block_k):
        t = t.astype(jnp.bfloat16)
    p = jnp.exp2(t)
    if mask is not None:
        p = jnp.where(mask, p, jnp.zeros((), p.dtype))
    v = tile_cast(v_raw, tile_dtype)
    pv = mxu_dot_out(tile_cast(p, tile_dtype).astype(v.dtype), v, exact=True)
    if fold_rowsum:
        l = pv[:, head_dim][:, None]
    else:
        l = jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o = (pv[:, :head_dim] * l_inv).astype(out_dtype)
    if not want_lse:
        return o, None
    lse = m * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
    return o, lse


def _fa2_fwd_single_kv(
    q_ref, k_ref, v_ref, qseg_ref, kvseg_ref, o_ref, lse_ref, *,
    sm_scale, causal, mask_value, kv_len, block_q, block_k,
    tile_dtype, mask_kv_tail, has_segments, fold_rowsum, q_idx,
    window=None, sinks=0,
):
    o, lse = _single_kv_attention(
        q_ref[0, 0], k_ref[0, 0], v_ref[0, 0],
        qseg_ref[0] if has_segments else None,
        kvseg_ref[0] if has_segments else None,
        sm_scale=sm_scale, causal=causal, mask_value=mask_value,
        kv_len=kv_len, block_q=block_q, block_k=block_k,
        tile_dtype=tile_dtype, mask_kv_tail=mask_kv_tail,
        fold_rowsum=fold_rowsum, q_idx=q_idx, out_dtype=o_ref.dtype,
        window=window, sinks=sinks,
    )
    o_ref[0, 0] = o
    lse_ref[0, 0] = lse


def _fa2_fwd_small_kernel(
    *refs,
    sm_scale, causal, mask_value, kv_len, seq_pad, group,
    tile_dtype, mask_kv_tail, has_segments, fold_rowsum, window=None,
    sinks=0,
):
    """Small-shape kernel: one grid cell per (batch, head-group), with the
    group's heads PACKED along the sequence axis into a single
    [group*seq_pad, D] tile and attended in ONE block-diagonal matmul +
    softmax.  At tiny sequence lengths (the reference's Edge-SmallSeq /
    NonPowerOf2 configs) the cost is instruction issue, not FLOPs: the
    per-head loop this replaces emitted `group` copies of every matmul and
    VPU op, while the MXU ran almost empty.  The cross-head score blocks are
    masked off — wasted MXU flops (group× the useful QK^T work) on an
    otherwise idle unit, in exchange for a group× cut in instruction count."""
    if has_segments:
        q_ref, k_ref, v_ref, qseg_ref, kvseg_ref, o_ref, lse_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref = refs
        qseg_ref = kvseg_ref = None
    head_dim = q_ref.shape[-1]
    rows = group * seq_pad
    # Scale/cast the whole head group in ONE wide VPU op, then merge the
    # (group, seq_pad) leading dims — layout-preserving because seq_pad is a
    # sublane multiple (seq_pad_quantum).
    c = sm_scale * LOG2E
    q_all = q_ref[0].astype(jnp.float32) * c  # [group, seq_pad, D]
    q_all = (
        q_all.astype(q_ref.dtype) if tile_dtype is None
        else tile_cast(q_all, tile_dtype)
    )
    qp = q_all.reshape(rows, head_dim)
    kp = tile_cast(k_ref[0], tile_dtype).reshape(rows, head_dim)
    s = mxu_dot_tb(qp, kp)  # [rows, rows], log2-domain scores

    row = lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    col = lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    mask = (row // seq_pad) == (col // seq_pad)  # block-diagonal: same head
    if causal:
        mask &= (row % seq_pad) >= (col % seq_pad)
    if window is not None:
        win = (row % seq_pad) - (col % seq_pad) < window
        if sinks > 0:
            win |= (col % seq_pad) < sinks
        mask &= win
    if mask_kv_tail:
        mask &= (col % seq_pad) < kv_len
    if has_segments:
        # Segment ids come PRE-EXPANDED per packed (batch, head) slot.
        qs = qseg_ref[0].reshape(rows, 1)
        ks = kvseg_ref[0].reshape(1, rows)
        mask &= qs == ks
    s += jnp.where(mask, 0.0, mask_value)

    m = jnp.max(s, axis=1)[:, None]
    p = jnp.exp2(s - m)
    # Fully-masked rows stay exactly zero.
    p = jnp.where(mask, p, 0.0)
    vp = tile_cast(v_ref[0], tile_dtype).reshape(rows, v_ref.shape[-1])
    pv = mxu_dot_out(tile_cast(p, tile_dtype).astype(vp.dtype), vp, exact=True)
    if fold_rowsum:
        l = pv[:, head_dim][:, None]
    else:
        l = jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o = (pv[:, :head_dim] * l_inv).astype(o_ref.dtype)
    o_ref[0] = o.reshape(group, seq_pad, head_dim)
    lse = m * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
    lse_ref[0] = lse.reshape(group, seq_pad, 1)


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
    fold_rowsum: bool,
    window=None,
    sinks=0,
    window_span=None,
):
    if has_segments:
        (q_ref, k_ref, v_ref, qseg_ref, kvseg_ref,
         o_ref, lse_ref, *scratch) = refs
    else:
        q_ref, k_ref, v_ref, o_ref, lse_ref, *scratch = refs
        qseg_ref = kvseg_ref = None
    if fold_rowsum:
        m_scr, acc_scr = scratch  # acc [block_q, NUM_LANES]; lane D carries l
        l_scr = None
    else:
        m_scr, l_scr, acc_scr = scratch
    # Ref shapes: q/o [1,1,block_q,D]; k [1,1,block_k,D];
    # v [1,1,block_k,NUM_LANES] when fold_rowsum else [1,1,block_k,D];
    # lse [1,1,block_q,NUM_LANES]; qseg [1,block_q,1]; kvseg [1,1,block_k];
    # scratch m/l [block_q,NUM_LANES] f32, acc f32.
    q_idx = pl.program_id(2)
    kv_prog = pl.program_id(3)
    span_dup_dead = None
    if window_span is not None:
        # Compact window grid: the kv grid dimension covers only the live
        # span, anchored so its LAST iteration is the diagonal block —
        # kv_prog is span-relative; recover the absolute block index.
        # With attention sinks the first `sink_blocks` slots own the sink
        # KV blocks (attendable by EVERY q block) and the remaining
        # window_span slots own the diagonal-anchored window span;
        # ownership partitions at block index sink_blocks, so a window
        # slot landing on a sink-owned block is a DUPLICATE and must not
        # contribute (span_dup_dead) — the sink slot already computed it
        # with the full element mask.
        sink_blocks = (sinks + block_k - 1) // block_k
        diag = jnp.minimum(
            (q_idx * block_q + block_q - 1) // block_k, num_kv_blocks - 1
        )
        span_lo = jnp.maximum(diag - (window_span - 1), 0)
        if sink_blocks:
            is_sink_slot = kv_prog < sink_blocks
            win_idx = span_lo + (kv_prog - sink_blocks)
            kv_idx = jnp.where(is_sink_slot, kv_prog, win_idx)
            span_dup_dead = jnp.where(
                is_sink_slot, kv_prog > diag, win_idx < sink_blocks
            )
        else:
            kv_idx = span_lo + kv_prog
        last_prog = sink_blocks + window_span - 1
    else:
        kv_idx = kv_prog
        last_prog = num_kv_blocks - 1
    head_dim = q_ref.shape[-1]

    if num_kv_blocks == 1:
        # Single-KV-block fast path: the whole KV fits one tile, so the
        # online-softmax machinery (running max/l, alpha rescale, scratch
        # round trips) is pure overhead — direct softmax per cell instead.
        # This is what makes the kernel beat the fused-XLA materialized path
        # on the mid-size suite configs.
        _fa2_fwd_single_kv(
            q_ref, k_ref, v_ref, qseg_ref, kvseg_ref, o_ref, lse_ref,
            sm_scale=sm_scale, causal=causal, mask_value=mask_value,
            kv_len=kv_len, block_q=block_q, block_k=block_k,
            tile_dtype=tile_dtype, mask_kv_tail=mask_kv_tail,
            has_segments=has_segments, fold_rowsum=fold_rowsum, q_idx=q_idx,
            window=window, sinks=sinks,
        )
        return

    @pl.when(kv_prog == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, -jnp.inf, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)
        if l_scr is not None:
            l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)

    should_run = True
    if causal:
        should_run = below_or_on_diag(q_idx, block_q, kv_idx, block_k)
    if window is not None:
        # Sliding window kills OLD kv blocks the same way causal kills
        # FUTURE ones — both skips compose (attention-sink blocks stay live).
        should_run &= within_window(
            q_idx, block_q, kv_idx, block_k, window, sinks
        )
    if span_dup_dead is not None:
        should_run &= jnp.logical_not(span_dup_dead)

    @pl.when(should_run)
    def _run():
        # Fold sm_scale AND the exp->exp2 change of base into Q once per
        # block: one [block_q, D] multiply replaces a [block_q, block_k]
        # multiply per KV tile, and downstream exp becomes native exp2.
        c = sm_scale * LOG2E
        q = q_ref[0, 0].astype(jnp.float32) * c
        # Back to the effective matmul dtype (scaling ran in fp32 so bf16
        # inputs lose nothing beyond their storage rounding).
        q = q.astype(q_ref.dtype) if tile_dtype is None else tile_cast(q, tile_dtype)
        k = tile_cast(k_ref[0, 0], tile_dtype)
        s = mxu_dot_tb(q, k)  # [block_q, block_k], log2-domain scores

        mask = build_block_mask(
            q_idx, kv_idx, block_q, block_k,
            causal=causal, mask_kv_tail=mask_kv_tail, kv_len=kv_len,
            q_seg=qseg_ref[0] if has_segments else None,
            kv_seg=kvseg_ref[0] if has_segments else None,
            window=window, sinks=sinks,
        )
        if mask is not None:
            s += jnp.where(mask, 0.0, mask_value)

        m_prev = m_scr[...]  # [block_q, 128] lane-replicated, log2 units
        m_curr = jnp.max(s, axis=1)[:, None]  # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)  # [block_q, 128]
        alpha = jnp.exp2(m_prev - m_next)
        # Single-lane broadcast (m_next[:, :1]) instead of a materialized
        # lane-tile: saves a (block_q, block_k) VPU copy per KV step.
        t = s - m_next[:, :1]
        if bf16_vpu_chain(tile_dtype, q_ref.dtype, t.size):
            t = t.astype(jnp.bfloat16)  # half-width exp2 (bf16_vpu_chain)
        p = jnp.exp2(t)
        if mask is not None:
            # Exact zero for masked entries: for causal/tail masks exp2
            # already underflows to 0, but a FULLY-masked row (possible with
            # segment ids) would otherwise normalize the mask value itself.
            p = jnp.where(mask, p, jnp.zeros((), p.dtype))
        m_scr[...] = m_next

        v = tile_cast(v_ref[0, 0], tile_dtype)
        pv = mxu_dot_out(
            tile_cast(p, tile_dtype).astype(v.dtype), v, exact=True
        )  # [block_q, D] or [block_q, NUM_LANES] with rowsum(p) in lane D
        if fold_rowsum:
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv
        else:
            l_scr[...] = (
                alpha * l_scr[...]
                + jnp.sum(p, axis=1, dtype=jnp.float32)[:, None]
            )
            acc_scr[...] = acc_scr[...] * alpha[:, :1] + pv

    @pl.when(kv_prog == last_prog)
    def _store():
        if fold_rowsum:
            l = acc_scr[:, head_dim][:, None]  # [block_q, 1]
        else:
            l = l_scr[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[:, :head_dim] * l_inv[:, :1]).astype(o_ref.dtype)
        # logsumexp contract parity: log(sum exp(s - m)) + m in NATURAL log
        # (/root/reference/kernels/kernel_fa2_optimized.cu:339-344); the max
        # is in log2 units, hence the LN2 change of base.  The stat output
        # is a width-1 column [block_q, 1] — materializing lane-replicated
        # stats costs a measurable HBM pass on the backward's scale
        # (profiler: 2 x 0.18 ms broadcast at B8 H16 S2048).
        lse = m_scr[:, :1] * LN2 + jnp.log(jnp.where(l == 0.0, 1.0, l))
        lse_ref[0, 0] = lse


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "kv_len", "tile_dtype", "window", "sinks",
        "interpret", "debug",
    ),
)
def fa2_forward_small_aligned(
    q,  # [B, H, S_pad, D], S_pad <= 128 (whole problem is one tile per head)
    k, v,
    q_seg=None,   # [B, S_pad, 1] int32
    kv_seg=None,  # [B, 1, S_pad] int32
    *,
    causal: bool,
    sm_scale: float,
    kv_len: int,
    tile_dtype=None,
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
    debug: bool = False,
):
    """Small-shape forward: the (batch, head) axes FUSE into one packing
    axis — packed slots never attend each other (the kernel's
    block-diagonal mask isolates them), so batch rows pack exactly like
    heads.  Grid ((B*H)/G,) with G slots per cell: at tiny sequence
    lengths the per-cell grid/DMA/instruction overhead dominates, and the
    Edge configs (B1-B4, few heads) left most cells nearly empty when
    only heads grouped (round-2 verdict #7).  Returns
    (O, lse_col [B, H, S_pad, 1])."""
    batch, heads, seq_pad, head_dim = q.shape
    assert seq_pad <= NUM_LANES and k.shape[2] == seq_pad
    fused = batch * heads
    q = q.reshape(1, fused, seq_pad, head_dim)
    k = k.reshape(1, fused, seq_pad, head_dim)
    v = v.reshape(1, fused, seq_pad, v.shape[-1])
    has_segments = q_seg is not None
    if has_segments:
        # Expand per-batch segment ids to per packed slot.
        q_seg = jnp.broadcast_to(
            q_seg[:, None], (batch, heads, seq_pad, 1)
        ).reshape(1, fused, seq_pad, 1)
        kv_seg = jnp.broadcast_to(
            kv_seg[:, None], (batch, heads, 1, seq_pad)
        ).reshape(1, fused, 1, seq_pad)
    # Largest divisor of `fused` keeping the packed score tile <= 512 rows
    # (scores grow quadratically in group*seq_pad; 512x512 fp32 = 1 MB VMEM
    # and a single well-filled MXU op).
    group = max(1, min(fused, 512 // seq_pad))
    while fused % group:
        group -= 1

    fold_rowsum = use_fold_rowsum(head_dim, tile_dtype, q.dtype)
    if fold_rowsum:
        v = augment_v(v)
    v_width = v.shape[-1]

    def qkv_map(g):
        return (0, g, 0, 0)

    kernel = functools.partial(
        _fa2_fwd_small_kernel,
        sm_scale=sm_scale, causal=causal, mask_value=DEFAULT_MASK_VALUE,
        kv_len=kv_len, seq_pad=seq_pad, group=group, tile_dtype=tile_dtype,
        mask_kv_tail=(kv_len != seq_pad), has_segments=has_segments,
        fold_rowsum=fold_rowsum, window=window, sinks=sinks,
    )
    in_specs = [
        pl.BlockSpec((1, group, seq_pad, head_dim), qkv_map),
        pl.BlockSpec((1, group, seq_pad, head_dim), qkv_map),
        pl.BlockSpec((1, group, seq_pad, v_width), qkv_map),
    ]
    inputs = [q, k, v]
    if has_segments:
        in_specs += [
            pl.BlockSpec((1, group, seq_pad, 1), qkv_map),
            pl.BlockSpec((1, group, 1, seq_pad), qkv_map),
        ]
        inputs += [q_seg, kv_seg]
    o, lse = pl.pallas_call(
        kernel,
        grid=(fused // group,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, group, seq_pad, head_dim), qkv_map),
            pl.BlockSpec((1, group, seq_pad, 1), qkv_map),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((1, fused, seq_pad, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=resolve_interpret(interpret),
        debug=debug,
    )(*inputs)
    return (
        o.reshape(batch, heads, seq_pad, head_dim),
        lse.reshape(batch, heads, seq_pad, 1),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "kv_len",
        "tile_dtype", "kv_groups", "window", "sinks", "interpret", "debug",
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
    window: int | None = None,
    sinks: int = 0,
    interpret=None,
    debug: bool = False,
):
    """Block-aligned FA2 forward. Returns (O, lse_col) where lse_col is the
    logsumexp as a width-1 stat column [B, Hq, Sq_pad, 1] (fp32) saved as
    the backward residual.

    ``kv_groups`` enables kernel-native GQA: query head h reads KV head
    h // kv_groups straight from HBM — no repeated KV materialization, so KV
    HBM traffic stays 1x regardless of the group size.

    ``window`` enables sliding-window (local) attention: query i attends
    only to keys j with i - j < window (and j <= i; requires causal).  KV
    blocks entirely past the window are tile-skipped, so prefill cost is
    O(S * window) instead of O(S^2 / 2).

    (A retired round-3 variant replaced the running max with a precomputed
    Cauchy-Schwarz row bound — on-chip A/B measured zero effect at both the
    round-3 and round-4 block optima, so the online max stays and the
    CFA_STATIC_MAX knob was deleted.)"""
    batch, heads, q_len, head_dim = q.shape
    kv_len_pad = k.shape[2]
    assert q_len % block_q == 0 and kv_len_pad % block_k == 0
    assert k.shape[1] * kv_groups == heads
    if window is not None:
        # causal: standard sliding window (>= 1); causal=False: recency
        # band whose offset may be <= 0 (ring shard decomposition).
        assert (not causal) or window >= 1
    num_kv_blocks = kv_len_pad // block_k
    # Compact window grid: with a sliding window only ~window/block_k KV
    # blocks per Q block are live, but a dense grid still pays a pipeline
    # iteration for every dead block (its DMA is redirected by _kv_clamp,
    # its compute skipped by pl.when — the bookkeeping is not free: at
    # S=16k/W=4k/block=512, 70% of iterations were dead).  Size the kv grid
    # dimension to the live span instead and anchor its end at the diagonal
    # block via the index map — O(S*window) iterations, none dead except
    # alignment/start-of-sequence edges.
    # Round 5 extends the compact grid to attention sinks (the first
    # cdiv(sinks, block_k) grid slots own the always-live sink blocks) and
    # to causal cross-attention shapes (q_len != kv_len_pad: the diagonal
    # anchor clamps to the last kv block) — both previously fell back to
    # the dense grid and paid a pipeline iteration per dead block
    # (round-4 verdict item 9).
    window_span = None
    sink_blocks = 0
    if window is not None and causal:
        sink_blocks = (sinks + block_k - 1) // block_k if sinks else 0
        span = (block_q + window - 2) // block_k + 2
        if sink_blocks + span < num_kv_blocks:
            window_span = span
    grid = (
        batch, heads, q_len // block_q,
        (sink_blocks + window_span) if window_span is not None
        else num_kv_blocks,
    )
    fold_rowsum = use_fold_rowsum(head_dim, tile_dtype, q.dtype)
    if fold_rowsum:
        v = augment_v(v)
    v_width = v.shape[-1]

    def _live(qi, ki):
        live = below_or_on_diag(qi, block_q, ki, block_k)
        if window is not None:
            live &= within_window(qi, block_q, ki, block_k, window, sinks)
        return live

    def _kv_clamp(qi, ki):
        """Dead (skipped) blocks redirect their prefetch to a LIVE block —
        block 0 when it is a sink block, else the oldest in-window one —
        instead of wasting DMA on dead data."""
        if window is None or sinks > 0:
            return lax.select(_live(qi, ki), ki, 0)
        lo = jnp.maximum(0, (qi * block_q - (window - 1)) // block_k)
        return lax.select(_live(qi, ki), ki, lo)

    def _span_block(qi, ki):
        """Absolute kv block for span-relative index ki (compact grid):
        slots < sink_blocks own the sink blocks, the rest form the
        diagonal-anchored window span (last slot = diagonal block).
        Dead/duplicate slots redirect their DMA to a LIVE block (the
        diagonal) — must mirror the kernel's kv_idx recovery exactly."""
        diag = jnp.minimum(
            (qi * block_q + block_q - 1) // block_k, num_kv_blocks - 1
        )
        lo = jnp.maximum(diag - (window_span - 1), 0)
        if sink_blocks:
            win = lo + (ki - sink_blocks)
            win = jnp.where(win < sink_blocks, diag, win)
            return jnp.where(ki < sink_blocks, jnp.minimum(ki, diag), win)
        return lo + ki

    def q_index_map(b, h, qi, ki):
        return (b, h, qi, 0)

    def kv_index_map(b, h, qi, ki):
        if window_span is not None:
            ki = _span_block(qi, ki)
        elif causal:
            ki = _kv_clamp(qi, ki)
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
        fold_rowsum=fold_rowsum,
        window=window,
        sinks=sinks,
        window_span=window_span,
    )

    in_specs = [
        pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
        pl.BlockSpec((1, 1, block_k, head_dim), kv_index_map),
        pl.BlockSpec((1, 1, block_k, v_width), kv_index_map),
    ]
    inputs = [q, k, v]
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

    out_shape = (
        jax.ShapeDtypeStruct(q.shape, q.dtype),
        jax.ShapeDtypeStruct((batch, heads, q_len, 1), jnp.float32),
    )
    scratch_shapes = [pltpu.VMEM((block_q, NUM_LANES), jnp.float32)]  # m
    if not fold_rowsum:  # separate l scratch
        scratch_shapes.append(pltpu.VMEM((block_q, NUM_LANES), jnp.float32))
    scratch_shapes.append(
        pltpu.VMEM((block_q, NUM_LANES if fold_rowsum else head_dim), jnp.float32)
    )
    o, lse_rep = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((1, 1, block_q, head_dim), q_index_map),
            pl.BlockSpec((1, 1, block_q, 1), q_index_map),
        ),
        scratch_shapes=scratch_shapes,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # Large-block configs carry ~20+ MB of fp32 score/ds tiles; the
            # default 16 MB scoped-vmem cap rejects them (v5e has 128 MB).
            vmem_limit_bytes=100 * 1024 * 1024,
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
