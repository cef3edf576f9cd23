"""Public FlashAttention-2 API: padding, dispatch, and autodiff wiring.

This is the TPU analog of the reference's dispatch + launch surface
(/root/reference/include/dispatcher.h:220-246 RunFlashAttention and the host
launchers in kernels/*.cu): runtime shapes are normalized (zero-padded to the
128-lane block grid — replacing the reference's per-element bound checks),
block sizes are fitted to the padded shapes, and forward/backward are wired
through `jax.custom_vjp` with the (O, logsumexp) residual contract
(SURVEY.md §3.4: kernel-produced logsumexp feeds the kernel backward).

Ragged sequence lengths (the reference's Edge-NonPowerOf2 S=100 and
Edge-SmallSeq S=32 configs, test_flash_attention2.py:1395-1409) are supported
for any S >= 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.kernels.common import (
    MIN_BLOCK,
    BlockSizes,
    pad_to_block,
    round_up,
    seq_pad_quantum,
)
from cuda_flash_attention_tpu.kernels.fa2_backward import (
    fa2_backward_dkv_aligned,
    fa2_backward_dq_aligned,
    fa2_backward_fused_aligned,
)
from cuda_flash_attention_tpu.kernels.fa2_forward import (
    fa2_forward_aligned,
    fa2_forward_small_aligned,
)

# The fused backward emits dq as per-KV-slice partials (num_kv_blocks x dq
# memory); above this slice count the two-kernel path's recompute is cheaper
# than the partial-buffer HBM traffic.
_FUSED_BWD_MAX_KV_SLICES = 8
# ... and above this dq-partials footprint (B*H*slices*S*D fp32) the fused
# path is rejected outright — slice count alone ignores live memory and can
# OOM large-batch training that the two-kernel path handles fine.
_FUSED_BWD_MAX_DQPART_BYTES = 1 << 30


def _use_fused_bwd(q, k, bk_dkv: int, window=None, causal=False,
                   sinks=0) -> bool:
    # A narrow sliding window prefers the two-kernel path: its compact
    # window grids (fa2_backward.py) iterate only the live span, while the
    # fused kernel's dense inner sweep pays bookkeeping + a dq_part HBM
    # write for every dead cell.
    if window is not None and causal and sinks == 0 and 2 * window < k.shape[2]:
        return False
    num_slices = k.shape[2] // bk_dkv
    if num_slices > _FUSED_BWD_MAX_KV_SLICES:
        return False
    dq_part_bytes = 4 * q.shape[0] * q.shape[1] * num_slices * q.shape[2] * q.shape[3]
    return dq_part_bytes <= _FUSED_BWD_MAX_DQPART_BYTES


__all__ = [
    "BlockSizes",
    "flash_attention",
    "flash_attention_with_lse",
    "fa2_backward",
]

# Measured on v5e (round-2 profiler sweep): with the lane-packed fp32
# emulation and the single-KV fast path the Pallas kernel beats the fused-XLA
# materialized path on every suite config with >= 8 MB of score matrix
# (Medium-1 and up: 1.2-2.5x).  Only tiny problems (the S=100/S=32 Edge
# configs, ~0.5-5 MB of scores) remain instruction-issue-bound where XLA's
# fusion has less fixed overhead — those keep the XLA route.
# Reduced-precision tiles always use the kernel.
_XLA_SCORE_BYTES_MAX = 8 * 1024 ** 2


def _use_xla_path(q, k, tile_dtype, force_kernel) -> bool:
    # The crossover was measured for fp32 I/O only; reduced-precision inputs
    # (bf16 q/k/v) take the kernel's native-MXU fast path unconditionally.
    if force_kernel or tile_dtype is not None or q.dtype != jnp.float32:
        return False
    score_bytes = 4 * q.shape[0] * q.shape[1] * q.shape[2] * k.shape[2]
    return score_bytes <= _XLA_SCORE_BYTES_MAX


def _xla_attention(q, k, v, causal, sm_scale, with_lse,
                   q_segment_ids=None, kv_segment_ids=None, window=None,
                   sinks=0):
    from cuda_flash_attention_tpu.ops.reference import (
        vanilla_attention,
        vanilla_attention_with_lse,
    )

    _validate_shapes(q, k, v)

    groups = q.shape[1] // k.shape[1]
    if groups > 1:
        k = jnp.repeat(k, groups, axis=1)
        v = jnp.repeat(v, groups, axis=1)
    fn = vanilla_attention_with_lse if with_lse else vanilla_attention
    return fn(q, k, v, causal=causal, sm_scale=sm_scale,
              q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
              window=window, sinks=sinks)


def _validate_segments(q_segment_ids, kv_segment_ids, q, k):
    if (q_segment_ids is None) != (kv_segment_ids is None):
        raise ValueError(
            "q_segment_ids and kv_segment_ids must be given together"
        )
    if q_segment_ids is None:
        return
    if q_segment_ids.shape != (q.shape[0], q.shape[2]):
        raise ValueError(
            f"q_segment_ids must be [batch, q_len]="
            f"{(q.shape[0], q.shape[2])}; got {q_segment_ids.shape}"
        )
    if kv_segment_ids.shape != (k.shape[0], k.shape[2]):
        raise ValueError(
            f"kv_segment_ids must be [batch, kv_len]="
            f"{(k.shape[0], k.shape[2])}; got {kv_segment_ids.shape}"
        )


def _pack_segments(q_segment_ids, kv_segment_ids, q, k):
    """Pad segment ids to the block grid as
    (q_seg [B, Sq_pad, 1], kv_seg [B, 1, Skv_pad]) int32.

    The pad VALUE is irrelevant — there is NO sentinel contract on user ids:
    padded KV columns are masked by the kv_len tail check regardless of
    segment, padded Q rows' outputs are sliced off, and their gradient
    contributions vanish because dO is zero-padded (ds = p * (0 - 0) = 0)."""
    if q_segment_ids is None:
        return None
    q_pad = round_up(q.shape[2], seq_pad_quantum(q.shape[2], q.dtype)) - q.shape[2]
    kv_pad = round_up(k.shape[2], seq_pad_quantum(k.shape[2], k.dtype)) - k.shape[2]
    q_seg = jnp.pad(
        q_segment_ids.astype(jnp.int32), ((0, 0), (0, q_pad))
    )[:, :, None]
    kv_seg = jnp.pad(
        kv_segment_ids.astype(jnp.int32), ((0, 0), (0, kv_pad))
    )[:, None, :]
    return q_seg, kv_seg


# Shared with the ring/quant wrappers (kernels/common.py is the home).
from cuda_flash_attention_tpu.kernels.common import fit_block as _fit_block  # noqa: E402


def _validate_shapes(q, k, v):
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be [batch, heads, seq, head_dim]; got {q.shape}, "
            f"{k.shape}, {v.shape}"
        )
    if k.shape != v.shape:
        raise ValueError(f"k/v shape mismatch: {k.shape} vs {v.shape}")
    if q.shape[0] != k.shape[0] or q.shape[3] != k.shape[3]:
        raise ValueError(
            f"q and k must agree on batch/head_dim: {q.shape} vs {k.shape}"
        )
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"GQA requires query heads ({q.shape[1]}) to be a multiple of "
            f"KV heads ({k.shape[1]})"
        )


def _normalize_sinks(sinks, window) -> int:
    sinks = int(sinks)
    if sinks < 0:
        raise ValueError(f"sinks must be >= 0; got {sinks}")
    if sinks and window is None:
        raise ValueError("attention sinks require a sliding window")
    return sinks if window is not None else 0


def _normalize_window(window, causal, q_len, kv_len):
    """Validate sliding-window args; fold a no-op window away so it cannot
    force an extra compile cache entry or dead mask work.

    With causal=True this is the standard sliding window (last `window`
    keys).  With causal=False it is a RECENCY BAND: query i keeps keys
    j > i - window with no future bound — primarily an internal mode (ring
    attention decomposes a global sliding window into per-shard bands)."""
    if window is None:
        return None
    window = int(window)
    if causal and window < 1:
        raise ValueError(f"causal window must be >= 1; got {window}")
    # Non-causal bands may carry a NEGATIVE offset (ring decomposition:
    # only a past shard's newest keys serve the oldest queries) but must
    # keep at least one (i, j) pair alive.
    if not causal and window <= -(kv_len - 1):
        raise ValueError(
            f"band window {window} masks every key (kv_len {kv_len})"
        )
    # A window covering every in-range key distance is identical to no
    # window: causal needs i - j < window for j <= i (kv side); the
    # non-causal band also needs it for the largest i (q side).
    if window >= kv_len and (causal or window >= q_len):
        return None
    return window


def _normalize(q, k, v, sm_scale, block_sizes, causal=False, window=None):
    _validate_shapes(q, k, v)
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    if block_sizes is None:
        block_sizes = BlockSizes.default(causal, window=window)
    elif window is not None and min(
        block_sizes.block_q, block_sizes.block_k
    ) <= 256 and window >= 4 * min(
        block_sizes.block_q, block_sizes.block_k
    ):
        # Measured cliff (docs/ROOFLINE.md): at S=16k W=4k, b=256 compact
        # window grids run 0.65x of even the GLOBAL causal kernel — the
        # per-block pipeline overhead swamps the window's FLOP savings.
        # Explicit block choices are respected (VMEM pressure is a valid
        # reason), but loudly.
        import warnings

        warnings.warn(
            f"window={window} with block sizes <= 256 is in the measured "
            f"slowdown regime (0.65x of global attention at W=4k); omit "
            f"block_sizes to get BlockSizes.default(window=...) "
            f"(b={max(MIN_BLOCK, min(1024, window))}-ish) instead",
            stacklevel=3,
        )
    q_len, kv_len = q.shape[2], k.shape[2]
    q_pad = pad_to_block(q, 2, seq_pad_quantum(q_len, q.dtype))
    k_pad = pad_to_block(k, 2, seq_pad_quantum(kv_len, k.dtype))
    v_pad = pad_to_block(v, 2, seq_pad_quantum(kv_len, v.dtype))
    return q_pad, k_pad, v_pad, float(sm_scale), block_sizes, q_len, kv_len


def _replicate_lanes(x):
    """[B, H, S] -> width-1 stat column [B, H, S, 1] fp32 (the kernels read
    stats as [:, :1]; materializing lane-replicated copies costs an HBM pass
    per stat tensor at training scale)."""
    return x.astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# Differentiable core (block-aligned shapes).
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10, 11)
)
def _fa2(q, k, v, segs, kv_len, causal, sm_scale, block_sizes, tile_dtype,
         interpret, window=None, sinks=0):
    """segs: None or (q_seg [B, Sq_pad, 1], kv_seg [B, 1, Skv_pad]) int32."""
    o, _ = _fa2_fwd_impl(
        q, k, v, segs, kv_len, causal, sm_scale, block_sizes, tile_dtype,
        interpret, window, sinks,
    )
    return o


def _fa2_fwd_impl(q, k, v, segs, kv_len, causal, sm_scale, block_sizes,
                  tile_dtype, interpret=None, window=None, sinks=0):
    block_q = _fit_block(block_sizes.block_q, q.shape[2])
    block_k = _fit_block(block_sizes.block_k, k.shape[2])
    q_seg, kv_seg = segs if segs is not None else (None, None)
    if (
        q.shape[2] <= MIN_BLOCK
        and k.shape[2] == q.shape[2]
        and k.shape[1] == q.shape[1]
    ):
        # Tiny problems (the reference's Edge configs): head-grouped
        # single-tile kernel amortizes the per-grid-cell overhead.
        return fa2_forward_small_aligned(
            q, k, v, q_seg, kv_seg,
            causal=causal, sm_scale=sm_scale, kv_len=kv_len,
            tile_dtype=tile_dtype, window=window, sinks=sinks,
            interpret=interpret,
        )
    return fa2_forward_aligned(
        q, k, v, q_seg, kv_seg,
        causal=causal, sm_scale=sm_scale,
        block_q=block_q, block_k=block_k,
        kv_len=kv_len, tile_dtype=tile_dtype,
        kv_groups=q.shape[1] // k.shape[1], window=window, sinks=sinks,
        interpret=interpret,
    )


def _fa2_fwd(q, k, v, segs, kv_len, causal, sm_scale, block_sizes, tile_dtype,
             interpret, window=None, sinks=0):
    o, lse_rep = _fa2_fwd_impl(
        q, k, v, segs, kv_len, causal, sm_scale, block_sizes, tile_dtype,
        interpret, window, sinks,
    )
    return o, (q, k, v, segs, o, lse_rep)


def _fa2_bwd(kv_len, causal, sm_scale, block_sizes, tile_dtype, interpret,
             window, sinks, residuals, do):
    q, k, v, segs, o, lse_rep = residuals
    kv_groups = q.shape[1] // k.shape[1]
    bq_dkv = _fit_block(block_sizes.block_q_dkv, q.shape[2])
    bk_dkv = _fit_block(block_sizes.block_k_dkv, k.shape[2])
    dsegs = None if segs is None else (None, None)
    q_seg, kv_seg = segs if segs is not None else (None, None)
    if _use_fused_bwd(q, k, bk_dkv, window, causal, sinks):
        # D_i folds into the fused kernel (o passed instead of di): the
        # separate reduction pass the reference pays a whole launch for
        # (f-attn2-backward.cu:342-380) disappears.
        dq, dk, dv = fa2_backward_fused_aligned(
            q, k, v, do, lse_rep, None, q_seg, kv_seg, o=o,
            causal=causal, sm_scale=sm_scale,
            block_q=bq_dkv, block_k=bk_dkv,
            kv_len=kv_len, tile_dtype=tile_dtype, kv_groups=kv_groups,
            window=window, sinks=sinks, interpret=interpret,
        )
        return dq, dk, dv, dsegs
    # Two-kernel path: D_i = rowsum(dO * O) as a fused XLA preamble (the
    # reference's D_computation_reduction_kernel analog).
    di_rep = _replicate_lanes(
        jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    )
    dq = fa2_backward_dq_aligned(
        q, k, v, do, lse_rep, di_rep, q_seg, kv_seg,
        causal=causal, sm_scale=sm_scale,
        block_q=_fit_block(block_sizes.block_q_dq, q.shape[2]),
        block_k=_fit_block(block_sizes.block_k_dq, k.shape[2]),
        kv_len=kv_len, tile_dtype=tile_dtype, kv_groups=kv_groups,
        window=window, sinks=sinks, interpret=interpret,
    )
    dk, dv = fa2_backward_dkv_aligned(
        q, k, v, do, lse_rep, di_rep, q_seg, kv_seg,
        causal=causal, sm_scale=sm_scale,
        block_q=bq_dkv, block_k=bk_dkv,
        kv_len=kv_len, tile_dtype=tile_dtype, kv_groups=kv_groups,
        window=window, sinks=sinks, interpret=interpret,
    )
    return dq, dk, dv, dsegs


_fa2.defvjp(_fa2_fwd, _fa2_bwd)


# ---------------------------------------------------------------------------
# Public API.
# ---------------------------------------------------------------------------


def flash_attention(
    q,  # [B, H, Sq, D]
    k,  # [B, H, Skv, D]
    v,  # [B, H, Skv, D]
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    tile_dtype=None,
    q_segment_ids=None,   # [B, Sq] int32 — sequence-packing segment ids
    kv_segment_ids=None,  # [B, Skv] int32
    window: int | None = None,
    sinks: int = 0,
    force_kernel: bool = False,
    interpret=None,
):
    """Differentiable FlashAttention-2. Returns O with q's shape/dtype.

    GQA is kernel-native: k/v may carry fewer heads than q (q heads must be
    a multiple, ordered kv-head-major); each query head streams its KV head
    directly from HBM — no repeated-KV materialization.

    Segment ids enable sequence packing / padding masks: position i attends
    to j only when q_segment_ids[b, i] == kv_segment_ids[b, j] (composable
    with ``causal``). Any int32 ids work; give padding tokens an id that
    matches no real tokens (their O rows are zeros).

    ``window`` enables sliding-window (local) attention: query i attends to
    keys j with j <= i and i - j < window (requires causal=True; composable
    with GQA and segments).  Out-of-window KV tiles are skipped entirely, so
    cost scales O(S * window).  ``sinks`` > 0 (StreamingLLM attention
    sinks) keeps the first `sinks` keys attendable regardless of the
    window — the bounded-cache recipe for unbounded-length generation.

    ``tile_dtype`` is the SHM_PRECISION analog: Q/K/V/P tiles are cast to it
    (bf16/fp16) inside the kernel before the MXU matmuls while all softmax
    statistics stay fp32 (reference keeps fp16 SHM tiles,
    kernel_fa2_optimized_f16.cu:74-161).

    Small fp32 shapes dispatch to the fused-XLA path (same numerics, faster
    below the streaming crossover); ``force_kernel=True`` pins the Pallas
    kernel (the benchmark harness does, to measure the kernel itself).
    """
    _validate_segments(q_segment_ids, kv_segment_ids, q, k)
    window = _normalize_window(window, causal, q.shape[2], k.shape[2])
    sinks = _normalize_sinks(sinks, window)
    if _use_xla_path(q, k, tile_dtype, force_kernel):
        return _xla_attention(
            q, k, v, causal, sm_scale, with_lse=False,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            window=window, sinks=sinks,
        )
    segs = _pack_segments(q_segment_ids, kv_segment_ids, q, k)
    q_pad, k_pad, v_pad, sm_scale, block_sizes, q_len, kv_len = _normalize(
        q, k, v, sm_scale, block_sizes, causal, window
    )
    o = _fa2(
        q_pad, k_pad, v_pad, segs, kv_len, causal, sm_scale, block_sizes,
        tile_dtype, interpret, window, sinks,
    )
    return o[:, :, :q_len, :]


def flash_attention_with_lse(
    q, k, v,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    tile_dtype=None,
    q_segment_ids=None,
    kv_segment_ids=None,
    window: int | None = None,
    sinks: int = 0,
    force_kernel: bool = False,
    interpret=None,
):
    """FA2 forward returning (O, logsumexp[B, H, Sq] fp32) — the
    save-for-backward contract the CLI persists as logsumexp.bin
    (/root/reference/src/main.cpp:110-113). Not differentiable; use
    `flash_attention` for autodiff."""
    _validate_segments(q_segment_ids, kv_segment_ids, q, k)
    window = _normalize_window(window, causal, q.shape[2], k.shape[2])
    sinks = _normalize_sinks(sinks, window)
    if _use_xla_path(q, k, tile_dtype, force_kernel):
        return _xla_attention(
            q, k, v, causal, sm_scale, with_lse=True,
            q_segment_ids=q_segment_ids, kv_segment_ids=kv_segment_ids,
            window=window, sinks=sinks,
        )
    segs = _pack_segments(q_segment_ids, kv_segment_ids, q, k)
    q_pad, k_pad, v_pad, sm_scale, block_sizes, q_len, kv_len = _normalize(
        q, k, v, sm_scale, block_sizes, causal, window
    )
    o, lse_rep = _fa2_fwd_impl(
        q_pad, k_pad, v_pad, segs, kv_len, causal, sm_scale, block_sizes,
        tile_dtype, interpret, window, sinks,
    )
    return o[:, :, :q_len, :], lse_rep[:, :, :q_len, 0]


def fa2_backward(
    q, k, v, o, lse, do=None,
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    block_sizes: BlockSizes | None = None,
    tile_dtype=None,
    window: int | None = None,
    interpret=None,
):
    """Standalone FA2 backward from forward artifacts (O, logsumexp) —
    capability parity with the reference CLI backward mode, which reloads
    O.bin/logsumexp.bin and defaults dO = 1 (src/main.cpp:66-92).

    Returns (dQ, dK, dV).
    """
    if do is None:
        do = jnp.ones_like(o)
    window = _normalize_window(window, causal, q.shape[2], k.shape[2])
    q_pad, k_pad, v_pad, sm_scale, block_sizes, q_len, kv_len = _normalize(
        q, k, v, sm_scale, block_sizes, causal, window
    )
    quantum = seq_pad_quantum(q_len, q.dtype)
    o_pad = pad_to_block(o, 2, quantum)
    do_pad = pad_to_block(do, 2, quantum)
    lse_rep = _replicate_lanes(pad_to_block(lse, 2, quantum))
    kv_groups = q_pad.shape[1] // k_pad.shape[1]
    bq_dkv = _fit_block(block_sizes.block_q_dkv, q_pad.shape[2])
    bk_dkv = _fit_block(block_sizes.block_k_dkv, k_pad.shape[2])
    fused = _use_fused_bwd(q_pad, k_pad, bk_dkv, window, causal)
    di_rep = None
    if not fused:
        di_rep = _replicate_lanes(
            jnp.sum(
                o_pad.astype(jnp.float32) * do_pad.astype(jnp.float32),
                axis=-1,
            )
        )
    if fused:
        dq, dk, dv = fa2_backward_fused_aligned(
            q_pad, k_pad, v_pad, do_pad, lse_rep, None, o=o_pad,
            causal=causal, sm_scale=sm_scale,
            block_q=bq_dkv, block_k=bk_dkv,
            kv_len=kv_len, tile_dtype=tile_dtype, kv_groups=kv_groups,
            window=window, interpret=interpret,
        )
    else:
        dq = fa2_backward_dq_aligned(
            q_pad, k_pad, v_pad, do_pad, lse_rep, di_rep,
            causal=causal, sm_scale=sm_scale,
            block_q=_fit_block(block_sizes.block_q_dq, q_pad.shape[2]),
            block_k=_fit_block(block_sizes.block_k_dq, k_pad.shape[2]),
            kv_len=kv_len, tile_dtype=tile_dtype, kv_groups=kv_groups,
            window=window, interpret=interpret,
        )
        dk, dv = fa2_backward_dkv_aligned(
            q_pad, k_pad, v_pad, do_pad, lse_rep, di_rep,
            causal=causal, sm_scale=sm_scale,
            block_q=bq_dkv, block_k=bk_dkv,
            kv_len=kv_len, tile_dtype=tile_dtype, kv_groups=kv_groups,
            window=window, interpret=interpret,
        )
    return (
        dq[:, :, :q_len, :],
        dk[:, :, :kv_len, :],
        dv[:, :, :kv_len, :],
    )
