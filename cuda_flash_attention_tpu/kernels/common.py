"""Shared kernel-layer utilities: block-size config, padding, masking.

TPU-first redesign of the reference's compile-time tile constants
(BM=BN=32, TM=TN=4, BK=4 at /root/reference/kernels/kernel_fa2_optimized.cu:388-399):
on TPU the natural tile quantum is the (8, 128) register tile and the 128x128
MXU, so all sequence blocks are multiples of 128 and ragged sequence lengths
(reference: per-element bound checks + -FLT_MAX padding,
kernel_fa2_optimized.cu:169-190) are handled by zero-padding to the block grid
and masking inside the kernel.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

NUM_LANES = 128
NUM_SUBLANES = 8
MIN_BLOCK = 128
# exp2-domain softmax constants: exp(x) = exp2(x * LOG2E). The VPU's native
# transcendental is exp2; folding LOG2E into the Q scale removes a
# [block_q, block_k] multiply per KV tile.
LOG2E = 1.4426950408889634
LN2 = 0.6931471805599453
# -inf would produce NaN via exp(-inf - (-inf)) on fully-masked rows; a large
# finite negative keeps the online softmax NaN-free (same reasoning as the
# reference's -FLT_MAX row padding, kernel_fa2_optimized.cu:183-184).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

TRANS_B_DIMS = (((1,), (1,)), ((), ()))  # x @ y.T


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile-size configuration for the FA2 kernel family.

    The analog of the reference dispatcher's compile-time tile template
    parameters (/root/reference/include/dispatcher.h:15-105), but in units of
    TPU blocks (multiples of 128 along sequence dims).
    """

    # Defaults are the v5e profiler-sweep optima at S=2048 D=64 (round-4
    # re-sweep, plots/autotune_r4.json; fp32 and bf16 agree): the
    # non-causal forward wants the WHOLE problem in one grid cell per
    # (b, h) — 2048x2048 beats 1024x2048 by ~2% on both tile dtypes (fewer
    # online-softmax rescale steps).  The fused backward's KERNEL prefers
    # a 1024-tall Q slice (3.850 vs 3.858 ms) but the FULL program is
    # faster at 512 (4.002 vs 4.050 ms — the taller slice inflates the
    # surrounding stat-broadcast/partial-sum ops), so 512 stays.  Causal
    # wants KV blocks small enough for the above-diagonal tile-skip to
    # pay — `default(causal)` picks per-case.
    block_q: int = 2048
    block_k: int = 2048
    block_q_dkv: int = 512
    block_k_dkv: int = 2048
    block_q_dq: int = 512
    block_k_dq: int = 2048

    def __post_init__(self):
        for f in dataclasses.fields(self):
            v = getattr(self, f.name)
            if v % MIN_BLOCK != 0:
                raise ValueError(f"{f.name}={v} must be a multiple of {MIN_BLOCK}")

    @classmethod
    def default(cls, causal: bool = False,
                window: int | None = None) -> "BlockSizes":
        if window is not None:
            # Sliding window: with the COMPACT window grid (the kv/q grid
            # dim covers only the live span) dead-iteration cost is gone,
            # so the trade is over-compute at the window edges (~block/2
            # extra cols/row) vs per-block efficiency.  On-chip sweep at
            # S=16k W=4k bf16 (logs/window_ab.log): b256 7.09 ms, b512
            # 3.45, b1024 2.83 (= 1.62x over global causal, 91% of the
            # ideal FLOP ratio), b2048 3.25 — 1024 wins.
            b = max(MIN_BLOCK, min(1024, _next_pow2_at_most(window)))
            return cls(block_q=b, block_k=b, block_q_dkv=b, block_k_dkv=b,
                       block_q_dq=b, block_k_dq=b)
        if causal:
            # Round-5 causal re-sweep at the train shape (B4 HQ16/HKV8
            # S2048 D64 bf16, evidence/r5/causal_sweep.log): the forward's
            # WHOLE-PROBLEM 2048x2048 block beats 1024x1024 by 12% (0.807
            # vs 0.917 ms) — at S=2048 the tile-skip can save nothing a
            # smaller block doesn't lose in per-block efficiency (b=512:
            # 1.11 ms, b=256: 2.02 ms), so dense-causal-with-mask at max
            # block wins; larger S still skips whole above-diagonal 2048
            # blocks.  Backward optimum measured at the existing
            # (512, 1024) dkv pair (1.862 ms; 2048 dkv: 1.90).
            return cls(block_q=2048, block_k=2048, block_k_dkv=1024)
        return cls()


def _next_pow2_at_most(n: int) -> int:
    """Largest power of two <= n (window-sized block snapping)."""
    p = 1
    while p * 2 <= n:
        p *= 2
    return p


def fit_block(requested: int, padded_len: int) -> int:
    """Largest multiple of MIN_BLOCK that divides padded_len and is <=
    requested — how every kernel wrapper snaps its configured block size to
    an actual (padded) sequence length.  Sub-128 padded lengths (small-S
    fast path) use a single whole-sequence block."""
    if padded_len < MIN_BLOCK:
        return padded_len
    best = MIN_BLOCK
    b = MIN_BLOCK
    while b <= min(requested, padded_len):
        if padded_len % b == 0:
            best = b
        b += MIN_BLOCK
    return best


def seq_pad_quantum(seq_len: int, dtype) -> int:
    """Padding quantum for a sequence axis.  Sequences of at least one full
    block pad to the 128-lane block grid; shorter ones only to the dtype's
    sublane tile (8/16/32 for 4/2/1-byte types) — S=32 then runs a [32, D]
    block with ZERO padding waste instead of 16x the score area
    (the reference handles these via per-element bound checks,
    /root/reference/kernels/kernel_fa2_optimized.cu:169-190)."""
    if seq_len >= MIN_BLOCK:
        return MIN_BLOCK
    itemsize = jnp.dtype(dtype).itemsize
    return {4: 8, 2: 16, 1: 32}.get(itemsize, MIN_BLOCK)


def below_or_on_diag(q_idx, block_q: int, kv_idx, block_k: int):
    """True if the (q_idx, kv_idx) tile intersects or is below the diagonal —
    the causal tile-skip predicate."""
    return ((q_idx + 1) * block_q - 1) >= (kv_idx * block_k)


def within_window(q_idx, block_q: int, kv_idx, block_k: int, window: int,
                  sinks: int = 0):
    """True if the (q_idx, kv_idx) tile holds ANY pair with i - j < window
    (sliding-window attention: query i sees the last `window` keys j <= i).
    The oldest live key for the tile's first query row i0 = q_idx*block_q is
    j = i0 - window + 1; the tile is dead when its newest key predates it —
    the window twin of the causal tile-skip predicate.

    ``sinks`` > 0 (StreamingLLM attention sinks) additionally keeps tiles
    containing the first `sinks` global keys alive."""
    live = (kv_idx + 1) * block_k - 1 >= q_idx * block_q - (window - 1)
    if sinks > 0:
        live |= kv_idx * block_k < sinks
    return live


def build_block_mask(
    q_idx, kv_idx, block_q: int, block_k: int, *,
    causal: bool, mask_kv_tail: bool, kv_len: int,
    q_seg=None,   # [block_q, 1] int32 or None
    kv_seg=None,  # [1, block_k] int32 or None
    window: int | None = None,
    sinks: int = 0,
):
    """Boolean keep-mask for one (q_idx, kv_idx) tile, or None if nothing
    masks. Combines the ragged-KV tail check, the causal triangle, the
    sliding window (query i keeps only keys j with i - j < window, plus
    the first `sinks` keys — StreamingLLM attention sinks), and segment
    equality (sequence packing: token i attends to j only when their
    segment ids match)."""
    import jax.numpy as jnp
    from jax import lax

    mask = None
    if mask_kv_tail:
        col_ids = lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (kv_idx * block_k + col_ids) < kv_len
    if causal or window is not None:
        row_ids = (
            lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            + q_idx * block_q
        )
        col_ids = (
            lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
            + kv_idx * block_k
        )
        if causal:
            causal_mask = col_ids <= row_ids
            mask = (
                causal_mask if mask is None
                else jnp.logical_and(mask, causal_mask)
            )
        if window is not None:
            win_mask = row_ids - col_ids < window
            if sinks > 0:
                win_mask = jnp.logical_or(win_mask, col_ids < sinks)
            mask = (
                win_mask if mask is None else jnp.logical_and(mask, win_mask)
            )
    if q_seg is not None:
        seg_mask = q_seg == kv_seg  # [block_q, block_k] via broadcast
        mask = seg_mask if mask is None else jnp.logical_and(mask, seg_mask)
    return mask


def pad_to_block(x: jax.Array, axis: int, block: int):
    """Zero-pad `axis` of x up to a multiple of `block`."""
    size = x.shape[axis]
    padded = round_up(size, block)
    if padded == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, padded - size)
    return jnp.pad(x, pads)


@functools.lru_cache(maxsize=None)
def _interpret_default() -> bool:
    """Pallas TPU kernels run in interpreter mode on non-TPU backends so the
    whole suite is testable on the virtual CPU mesh."""
    return jax.default_backend() != "tpu"


def resolve_interpret(interpret) -> bool:
    if interpret is None:
        return _interpret_default()
    return bool(interpret)


def _fp16_storage_round(x):
    """Round-to-nearest-even to a 10-bit mantissa in fp32 — bitwise identical
    to an f32->f16->f32 round-trip for normal-range values.

    Mosaic on v5e cannot legalize in-kernel f32<->f16 vector converts
    (tpu.pack_subelements), so the fp16 *storage* precision is emulated with
    integer ops on the VPU. Exponent clamping/subnormal flush is not modeled
    (attention tiles never reach ±65504)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    lsb = (bits >> 13) & jnp.uint32(1)
    bits = bits + jnp.uint32(0xFFF) + lsb
    bits = bits & jnp.uint32(0xFFFFE000)
    return jax.lax.bitcast_convert_type(bits, jnp.float32)


def tile_cast(x, tile_dtype):
    """Cast a VMEM tile to the reduced `tile_dtype` for the MXU.

    bf16 is the MXU-native reduced precision and stays bf16. fp16 has no MXU
    matmul on TPU, so — exactly like the reference's fp16-SHM kernel, which
    stores __half tiles but converts to float before the FMAs
    (kernel_fa2_optimized_f16.cu:152-161) — fp16 is a storage-precision
    truncation: values are rounded to fp16 mantissa width, compute stays fp32.
    """
    if tile_dtype is None:
        return x
    if tile_dtype == jnp.float16:
        return _fp16_storage_round(x.astype(jnp.float32))
    return x.astype(tile_dtype)


# ---------------------------------------------------------------------------
# fp32 MXU emulation with lane packing.
#
# The MXU is a 128-wide bf16 systolic array; fp32 matmuls run as multi-pass
# bf16-chunk emulations.  At head_dim <= 64 every attention matmul leaves
# half the array idle (contraction or output lanes), so the stock HIGHEST
# emulation pays ~6 half-filled passes.  These helpers pack the bf16 chunk
# products into the idle lanes instead:
#
#   * contraction-style (QK^T, dO V^T — contract over D):  3-chunk splits
#     packed pairwise along the contraction lanes -> 3 FULL-width passes
#     covering all chunk products down to 2^-30 (full fp32 quality).
#   * output-style (PV, dS K, P^T dO — narrow output):  2-chunk splits with
#     the rhs chunks side by side in the output lanes -> 2 full passes
#     computing (a0+a1)(b0+b1), i.e. exact products of 16-bit-mantissa
#     operands (~1e-6 relative; the fp16-storage path is EXACT since its
#     values carry 10-bit mantissas).
#
# Measured v5e (B2 H8 S512 D64): QK^T 38.6 -> ~16 us, PV 36.7 -> 24.4 us vs
# XLA's own HIGHEST fusions at 41.3/22.6 us.  Deterministic (fixed order).
# ---------------------------------------------------------------------------


def _split2_bf16(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split3_bf16(x):
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# Below this row count a matmul is instruction/issue-bound, and the
# emulation's extra split/concat VPU passes and 3x instruction count cost
# more than the saved MXU passes — tiny tiles stay on native HIGHEST.
_EMULATE_MIN_ROWS = 256


def _can_pack(width: int) -> bool:
    return 2 * width <= NUM_LANES


def mxu_dot_tb(a, b):
    """a [m, d] @ b [n, d]^T -> [m, n] fp32 (contraction over the last dim).

    fp32 operands with d <= 64 use the lane-packed 3-pass emulation; other
    dtypes take the native MXU path."""
    import jax.lax as lax

    if (a.dtype == jnp.float32 and _can_pack(a.shape[-1])
            and a.shape[0] >= _EMULATE_MIN_ROWS):
        a0, a1, a2 = _split3_bf16(a)
        b0, b1, b2 = _split3_bf16(b)
        cat = lambda x, y: jnp.concatenate([x, y], axis=-1)  # noqa: E731
        s = lax.dot_general(cat(a0, a1), cat(b0, b0), TRANS_B_DIMS,
                            preferred_element_type=jnp.float32)
        s += lax.dot_general(cat(a0, a1), cat(b1, b1), TRANS_B_DIMS,
                             preferred_element_type=jnp.float32)
        s += lax.dot_general(cat(a0, a2), cat(b2, b0), TRANS_B_DIMS,
                             preferred_element_type=jnp.float32)
        return s
    return lax.dot_general(
        a, b, TRANS_B_DIMS, preferred_element_type=jnp.float32,
        precision=matmul_precision(a.dtype),
    )


def _packed_out_dot(a, b, dims, exact):
    """Shared lane-packed out-style emulation.  Two full-width passes cover
    (a0+a1)(b0+b1); `exact` adds one pass with the residual cross terms
    (a0 b2 + a2 b0) packed along the CONTRACTION dim — all six significant
    chunk products, i.e. full fp32 quality at half the HIGHEST pass count."""
    import jax.lax as lax

    d = b.shape[-1]
    b0, b1, b2 = _split3_bf16(b)
    bcat = jnp.concatenate([b0, b1], axis=-1)  # [K, 2d]
    out = None
    if exact:
        a0, a1, a2 = _split3_bf16(a)
    else:
        a0, a1 = _split2_bf16(a)
    for ac in (a0, a1):
        mm = lax.dot_general(ac, bcat, dims, preferred_element_type=jnp.float32)
        term = mm[:, :d] + mm[:, d:]
        out = term if out is None else out + term
    if exact:
        # Residual cross terms as two half-width passes: concatenating the
        # big lhs along the contraction dim costs a [m, 2K] VPU copy that
        # outweighs the saved MXU pass.
        out += lax.dot_general(a0, b2, dims, preferred_element_type=jnp.float32)
        out += lax.dot_general(a2, b0, dims, preferred_element_type=jnp.float32)
    return out


def mxu_dot_out(a, b, exact: bool = False):
    """a [m, K] @ b [K, d] -> [m, d] fp32 (narrow output, full contraction).

    fp32 with d <= 64: lane-packed emulation (2 passes ~1e-5 relative, or 3
    with exact=True for full fp32 quality); else native MXU."""
    import jax.lax as lax

    dims = (((1,), (0,)), ((), ()))
    if (a.dtype == jnp.float32 and _can_pack(b.shape[-1])
            and a.shape[0] >= _EMULATE_MIN_ROWS):
        return _packed_out_dot(a, b, dims, exact=exact)
    return lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=matmul_precision(a.dtype),
    )


def mxu_dot_ta_out(a, b, exact: bool = False):
    """a [K, m]^T @ b [K, d] -> [m, d] fp32 (contract dim 0 of both)."""
    import jax.lax as lax

    dims = (((0,), (0,)), ((), ()))
    if (a.dtype == jnp.float32 and _can_pack(b.shape[-1])
            and a.shape[1] >= _EMULATE_MIN_ROWS):
        return _packed_out_dot(a, b, dims, exact=exact)
    return lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32,
        precision=matmul_precision(a.dtype),
    )


def matmul_precision(operand_dtype):
    """Full-precision MXU passes only for fp32 operands (reference
    fp32-CUDA-core parity, <1e-6 error); reduced-precision operands (bf16)
    use the native fast path — Mosaic rejects HIGHEST on non-f32 inputs."""
    import jax.lax as lax

    return lax.Precision.HIGHEST if operand_dtype == jnp.float32 else None


def kv_storage_cast(x, head_dim, compute_dtype, ftz: bool = False):
    """storage_cast for paged-KV tiles that transparently unpacks the INT4
    split-half layout (stored width head_dim//2; byte lane j = element j in
    the low nibble, element j + head_dim//2 in the high nibble): two
    integer VPU ops plus ONE lane-concat restore the exact element order —
    no interleave, no permutation.  Packing is shape-inferred, so every
    other cache dtype passes straight through.

    ``ftz=True`` (paged decode kernels) asserts the PRODUCER flushed fp8
    subnormals to zero at quantization time (_quantize_rows), enabling the
    normal-only fp8 bit path — half the VPU surgery."""
    if x.shape[-1] * 2 == head_dim:
        # Widen to i32 FIRST: Mosaic cannot legalize 8-bit arith.subi /
        # xor on v5e (round-3 failure: "failed to legalize operation
        # 'arith.subi'"), so both nibble sign-extends run as i32 shift
        # pairs — fully supported VPU ops.  x is int8 and astype
        # sign-extends the byte, so bit 7 is replicated upward.
        xi = x.astype(jnp.int32)
        lo = (xi << 28) >> 28   # low nibble, sign bit at i32 bit 31
        hi = (xi << 24) >> 28   # high nibble likewise
        x = jnp.concatenate([lo, hi], axis=-1)
    return storage_cast(x, compute_dtype, ftz=ftz)


def storage_cast(x, compute_dtype, ftz: bool = False):
    """VPU-friendly cast from a KV-cache storage dtype to the compute dtype.

    int8/bf16/f32 use the native convert.  fp8 (e4m3fn/e5m2) has NO hardware
    on v5e and Mosaic's generic convert is ~4x the whole decode kernel's
    cost (measured: 546 vs 142 us/step) — so fp8 is widened by integer bit
    surgery instead: place sign/exp/mant into a bf16 pattern and rebias the
    exponent (e4m3 bias 7 -> bf16 bias 127 = +120), with a select for the
    subnormal range.  fp8 Inf/NaN payloads decode as large finite values —
    the KV quantizer never emits them (amax clipping).

    ``ftz=True``: the producer guaranteed no fp8 subnormal codes exist in
    storage (KV quantizer flush, kv_cache._quantize_rows), so the subnormal
    reconstruction (int->float convert + two selects) is skipped — the
    remaining normal-only path is ~half the VPU ops.  Subnormal codes, if
    ever present anyway, decode to small values <= 2x the true magnitude
    (bounded by the min normal) instead of exactly.
    """
    from jax import lax

    d = jnp.dtype(x.dtype)
    if d == jnp.dtype(jnp.float8_e4m3fn):
        mant_bits, bias = 3, 7
    elif d == jnp.dtype(jnp.float8_e5m2):
        mant_bits, bias = 2, 15
    else:
        return x.astype(compute_dtype)

    if ftz:
        rebias = 127 - bias
        b = lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        em = b & 0x7F
        shift = 23 - mant_bits
        bits = ((b & 0x80) << 24) | ((em << shift) + (rebias << 23))
        val = lax.bitcast_convert_type(bits, jnp.float32)
        # em == 0 is ZERO under the producer's flush contract (the formula
        # alone would decode it as the min normal).
        out = jnp.where(em == 0, 0.0, val)
        return out.astype(compute_dtype)

    # Build the f32 bit pattern in int32 (Mosaic has no 16-bit int converts):
    # f32 = s<<31 | (e + (127-bias))<<23 | m<<(23-mant_bits).
    rebias = 127 - bias
    b = lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
    em = b & 0x7F
    shift = 23 - mant_bits
    bits = ((b & 0x80) << 24) | ((em << shift) + (rebias << 23))
    val = lax.bitcast_convert_type(bits, jnp.float32)
    # e == 0: fp8 subnormals, value = m * 2^-(bias - 1 + mant_bits).
    sub = em.astype(jnp.float32) * (2.0 ** -(bias - 1 + mant_bits))
    sub = jnp.where(b >= 128, -sub, sub)
    out = jnp.where(em < (1 << mant_bits), sub, val)
    return out.astype(compute_dtype)


def lanes_broadcast(vec, width: int):
    """Broadcast a [rows, NUM_LANES] stat tile to [rows, width]."""
    if width == NUM_LANES:
        return vec
    if width < NUM_LANES:
        return vec[:, :width]
    reps, rem = divmod(width, NUM_LANES)
    if rem:
        raise NotImplementedError(f"{width=} must divide into {NUM_LANES} lanes")
    return jnp.tile(vec, (1, reps))
