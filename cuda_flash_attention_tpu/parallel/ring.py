"""Ring attention: sequence/context parallelism over the ICI ring.

Long-context capability with no reference counterpart (SURVEY.md §5
"long-context/sequence parallelism: absent"; north-star config 5): K/V shards
rotate around the mesh's "ctx" axis via `lax.ppermute` while every device
runs the local Pallas FA2 kernel on the block in front of it; per-step
partial results merge with the same online-softmax algebra the kernel uses
internally (logsumexp-weighted combine).  The permute for step s+1 is issued
before step s's compute so XLA's latency-hiding scheduler overlaps ICI
transfer with MXU work.

Causal handling per ring step (source shard `src`, own shard `idx`):
  src <  idx : every KV position is in the past -> full (unmasked) attention
  src == idx : the diagonal block -> standard causal kernel
  src >  idx : entirely in the future -> skipped (zero weight)
selected with `lax.switch` on the per-device shard index.

Backward: full attention's gradient decomposes exactly by KV block once the
GLOBAL logsumexp and D = rowsum(dO*O) are known (the same identity the
single-chip dKV/dQ split relies on, fa2_backward.py).  So the VJP runs the
ring again: dQ accumulates locally; dK/dV accumulators travel around the
ring WITH their K/V block (n rotations total) and arrive home fully summed —
the distributed analog of the reference's atomicAdd-free redesign.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

from cuda_flash_attention_tpu.kernels.attention import (
    _FUSED_BWD_MAX_KV_SLICES,
    _fit_block,
    _replicate_lanes,
    flash_attention_with_lse,
)
from cuda_flash_attention_tpu.kernels.common import (
    MIN_BLOCK,
    BlockSizes,
    pad_to_block,
)
from cuda_flash_attention_tpu.kernels.fa2_backward import (
    fa2_backward_dkv_aligned,
    fa2_backward_dq_aligned,
    fa2_backward_fused_aligned,
)
from cuda_flash_attention_tpu.parallel.mesh import CTX_AXIS, DATA_AXIS, MODEL_AXIS


def _merge_partial(o_num, l_den, m_run, o_i, lse_i):
    """Accumulate one normalized partial (o_i, lse_i) into the running
    (numerator, denominator, max) triple."""
    m_new = jnp.maximum(m_run, lse_i)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    w_old = jnp.where(m_run == -jnp.inf, 0.0, jnp.exp(m_run - m_safe))
    w_new = jnp.where(lse_i == -jnp.inf, 0.0, jnp.exp(lse_i - m_safe))
    o_num = o_num * w_old[..., None] + o_i * w_new[..., None]
    l_den = l_den * w_old + w_new
    return o_num, l_den, m_new


def _live_ring_steps(axis_size: int, causal: bool, window,
                     shard_len: int) -> int:
    """Number of ring steps that can contribute under a sliding window.
    Step t's KV shard sits t*shard_len positions in the past: its newest
    key (local jl = S-1) serves local query il=0 iff
    il - jl + t*S < window, i.e. t*S < window + S - 1.  Later rotations
    (compute AND ppermute) are skipped entirely, so window + causal costs
    ~ceil(window/shard_len) rotations, not axis_size - 1."""
    if not (causal and window is not None):
        return axis_size
    return min(axis_size, (window + 2 * shard_len - 2) // shard_len)


def _band_window(step: int, window, shard_len: int):
    """The LOCAL band for a past shard `step` rotations back: global
    i - j < window with j offset by step*shard_len becomes the per-shard
    recency band i_local - j_local < window - step*shard_len (the causal
    side is automatic — every key in a past shard precedes every local
    query).  The band offset can be NEGATIVE (only the shard's newest keys
    serve the oldest queries); None = the whole shard is in-window (plain
    full attention)."""
    if window is None:
        return None
    w_eff = window - step * shard_len
    return w_eff if w_eff < shard_len else None


def _ring_fwd_loop(q, k, v, *, axis_name, axis_size, causal, sm_scale,
                   tile_dtype, interpret, window=None):
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    shard_len = k.shape[2]

    def make_past_partial(step):
        band = _band_window(step, window, shard_len)

        def past_partial(args):
            q, k, v = args
            o, lse = flash_attention_with_lse(
                q, k, v, causal=False, sm_scale=sm_scale,
                tile_dtype=tile_dtype, window=band, interpret=interpret,
            )
            return o.astype(jnp.float32), lse  # uniform switch dtype
        return past_partial

    def causal_partial(args):
        q, k, v = args
        o, lse = flash_attention_with_lse(
            q, k, v, causal=True, sm_scale=sm_scale, tile_dtype=tile_dtype,
            window=window, interpret=interpret,
        )
        return o.astype(jnp.float32), lse

    def skip_partial(args):
        q, _, _ = args
        o = jnp.zeros(q.shape, jnp.float32)
        lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
        return o, lse

    o_num = jnp.zeros(q.shape, jnp.float32)
    l_den = jnp.zeros(q.shape[:-1], jnp.float32)
    m_run = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)

    n_steps = _live_ring_steps(axis_size, causal, window, shard_len)
    for step in range(n_steps):
        # Rotate K/V for the NEXT step first so the ICI transfer overlaps
        # with this step's kernel.
        if step < n_steps - 1:
            k_next = lax.ppermute(k, axis_name, perm)
            v_next = lax.ppermute(v, axis_name, perm)
        else:
            k_next = v_next = None
        src = (idx - step) % axis_size
        if causal:
            # case 0: src > idx (future, skip); 1: diagonal; 2: past
            # (full, or the in-window recency band when `window` is set)
            case = jnp.int32(1) + jnp.sign(idx - src)
            o_i, lse_i = lax.switch(
                case,
                [skip_partial, causal_partial, make_past_partial(step)],
                (q, k, v),
            )
        else:
            o_i, lse_i = make_past_partial(step)((q, k, v))
        o_num, l_den, m_run = _merge_partial(
            o_num, l_den, m_run, o_i.astype(jnp.float32), lse_i
        )
        if k_next is not None:
            k, v = k_next, v_next

    l_safe = jnp.where(l_den == 0.0, 1.0, l_den)
    o = (o_num / l_safe[..., None]).astype(q.dtype)
    lse = jnp.where(l_den == 0.0, -jnp.inf, m_run + jnp.log(l_safe))
    return o, lse


_STATIC = (3, 4, 5, 6, 7, 8, 9)  # axis_name..window


@functools.partial(jax.custom_vjp, nondiff_argnums=_STATIC)
def _ring(q, k, v, axis_name, axis_size, causal, sm_scale, tile_dtype,
          interpret, window=None):
    o, _ = _ring_fwd_loop(
        q, k, v, axis_name=axis_name, axis_size=axis_size, causal=causal,
        sm_scale=sm_scale, tile_dtype=tile_dtype, interpret=interpret,
        window=window,
    )
    return o


def _ring_fwd(q, k, v, axis_name, axis_size, causal, sm_scale, tile_dtype,
              interpret, window=None):
    o, lse = _ring_fwd_loop(
        q, k, v, axis_name=axis_name, axis_size=axis_size, causal=causal,
        sm_scale=sm_scale, tile_dtype=tile_dtype, interpret=interpret,
        window=window,
    )
    return o, (q, k, v, o, lse)


def _ring_bwd(axis_name, axis_size, causal, sm_scale, tile_dtype, interpret,
              window, residuals, do):
    q, k, v, o, lse = residuals
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    bs = BlockSizes.default()
    q_len, kv_len = q.shape[2], k.shape[2]

    q_pad = pad_to_block(q, 2, MIN_BLOCK)
    do_pad = pad_to_block(do.astype(q.dtype), 2, MIN_BLOCK)
    o_pad = pad_to_block(o, 2, MIN_BLOCK)
    lse_rep = _replicate_lanes(pad_to_block(lse, 2, MIN_BLOCK))
    di_rep = _replicate_lanes(
        jnp.sum(o_pad.astype(jnp.float32) * do_pad.astype(jnp.float32), axis=-1)
    )
    k_pad = pad_to_block(k, 2, MIN_BLOCK)
    v_pad = pad_to_block(v, 2, MIN_BLOCK)

    kw = dict(sm_scale=sm_scale, kv_len=kv_len, tile_dtype=tile_dtype,
              kv_groups=q.shape[1] // k.shape[1], interpret=interpret)
    bq_dkv = _fit_block(bs.block_q_dkv, q_pad.shape[2])
    bk_dkv = _fit_block(bs.block_k_dkv, k_pad.shape[2])

    # Fused backward only while its per-KV-slice dQ partial buffer stays
    # bounded (same guard as attention.py); long per-device shards fall back
    # to the two-kernel pair.
    use_fused = (k_pad.shape[2] // bk_dkv) <= _FUSED_BWD_MAX_KV_SLICES

    def grads_step(kv, is_causal, band):
        if use_fused:
            # One recompute of (S, dP) per ring step yields dQ partials AND
            # the traveling dK/dV contribution (fa2_backward.py).
            dq_i, dk_i, dv_i = fa2_backward_fused_aligned(
                q_pad, kv[0], kv[1], do_pad, lse_rep, di_rep,
                causal=is_causal, window=band,
                block_q=bq_dkv, block_k=bk_dkv, **kw,
            )
            return dq_i, (dk_i, dv_i)
        dq_i = fa2_backward_dq_aligned(
            q_pad, kv[0], kv[1], do_pad, lse_rep, di_rep,
            causal=is_causal, window=band,
            block_q=bq_dkv, block_k=bk_dkv, **kw,
        )
        dk_i, dv_i = fa2_backward_dkv_aligned(
            q_pad, kv[0], kv[1], do_pad, lse_rep, di_rep,
            causal=is_causal, window=band,
            block_q=bq_dkv, block_k=bk_dkv, **kw,
        )
        return dq_i, (dk_i, dv_i)

    shard_len = k.shape[2]

    def make_grads_past(step):
        band = _band_window(step, window, shard_len)

        def grads_past(args):
            kv, _, _ = args
            return grads_step(kv, False, band)
        return grads_past

    def grads_diag(args):
        kv, _, _ = args
        return grads_step(kv, True, window)

    def grads_skip(args):
        kv, _, _ = args
        return (
            jnp.zeros_like(q_pad),
            (jnp.zeros_like(kv[0]), jnp.zeros_like(kv[1])),
        )

    dq_acc = jnp.zeros_like(q_pad, dtype=jnp.float32)
    dk_acc = jnp.zeros_like(k_pad, dtype=jnp.float32)
    dv_acc = jnp.zeros_like(v_pad, dtype=jnp.float32)

    n_steps = _live_ring_steps(axis_size, causal, window, shard_len)
    for step in range(n_steps):
        src = (idx - step) % axis_size
        if causal:
            case = jnp.int32(1) + jnp.sign(idx - src)
            dq_i, (dk_i, dv_i) = lax.switch(
                case, [grads_skip, grads_diag, make_grads_past(step)],
                ((k_pad, v_pad), None, None),
            )
        else:
            dq_i, (dk_i, dv_i) = make_grads_past(step)(
                ((k_pad, v_pad), None, None)
            )
        dq_acc += dq_i.astype(jnp.float32)
        dk_acc += dk_i.astype(jnp.float32)
        dv_acc += dv_i.astype(jnp.float32)
        if step < n_steps - 1:
            # Rotate the block AND its traveling gradient accumulator.
            k_pad = lax.ppermute(k_pad, axis_name, perm)
            v_pad = lax.ppermute(v_pad, axis_name, perm)
            dk_acc = lax.ppermute(dk_acc, axis_name, perm)
            dv_acc = lax.ppermute(dv_acc, axis_name, perm)

    # Bring the traveling dK/dV home.  Without a window that is ONE more
    # hop (n_steps-1 rotations happened); with an early-stopped windowed
    # ring it is a single (axis_size - n_steps + 1)-hop permutation —
    # still one collective, so the window saves both compute AND ICI.
    hops = (axis_size - (n_steps - 1)) % axis_size
    if hops:
        perm_home = [
            (i, (i + hops) % axis_size) for i in range(axis_size)
        ]
        dk_acc = lax.ppermute(dk_acc, axis_name, perm_home)
        dv_acc = lax.ppermute(dv_acc, axis_name, perm_home)

    dq = dq_acc[:, :, :q_len, :].astype(q.dtype)
    dk = dk_acc[:, :, :kv_len, :].astype(k.dtype)
    dv = dv_acc[:, :, :kv_len, :].astype(v.dtype)
    return dq, dk, dv


_ring.defvjp(_ring_fwd, _ring_bwd)


def ring_attention_local(
    q,  # [B, H, Sq_local, D]  (this device's Q shard)
    k,  # [B, H, Skv_local, D] (this device's KV shard; rotates)
    v,
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    sm_scale: float | None = None,
    tile_dtype=None,
    window: int | None = None,
    interpret=None,
):
    """Per-shard differentiable ring attention — call inside shard_map.

    ``window`` (requires causal) applies the GLOBAL sliding window across
    the sharded sequence: the diagonal step runs the windowed causal
    kernel, past shards run the residual recency band, and rotations whose
    shard is entirely behind the window are skipped altogether — compute
    and ICI cost O(ceil(window / shard_len)) rotations, not axis_size."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    if window is not None:
        if not causal:
            raise ValueError("ring sliding window requires causal=True")
        window = int(window)
        if window >= axis_size * k.shape[2]:
            window = None  # covers the whole global sequence
    return _ring(
        q, k, v, axis_name, axis_size, causal, float(sm_scale), tile_dtype,
        interpret, window,
    )


def _ring_quant_fwd_loop(q, k_q, v_q, *, axis_name, axis_size, causal,
                         sm_scale, compute_dtype, interpret, window=None):
    """Forward-only quantized-KV ring: the QUANTIZED blocks (values + scales)
    rotate around the ring — 4x (int8/fp8 vs fp32) less ICI traffic per step
    than the full-precision ring, the long-context serving configuration."""
    from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (
        flash_attention_quantized_kv_with_lse,
    )

    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]
    shard_len = k_q.values.shape[2]

    def make_past_partial(step):
        band = _band_window(step, window, shard_len)

        def past_partial(args):
            q, k_q, v_q = args
            o, lse = flash_attention_quantized_kv_with_lse(
                q, k_q, v_q, causal=False, sm_scale=sm_scale,
                compute_dtype=compute_dtype, window=band,
                interpret=interpret,
            )
            return o.astype(jnp.float32), lse
        return past_partial

    def causal_partial(args):
        q, k_q, v_q = args
        o, lse = flash_attention_quantized_kv_with_lse(
            q, k_q, v_q, causal=True, sm_scale=sm_scale,
            compute_dtype=compute_dtype, window=window, interpret=interpret,
        )
        return o.astype(jnp.float32), lse

    def skip_partial(args):
        q, _, _ = args
        return (
            jnp.zeros(q.shape, jnp.float32),
            jnp.full(q.shape[:-1], -jnp.inf, jnp.float32),
        )

    o_num = jnp.zeros(q.shape, jnp.float32)
    l_den = jnp.zeros(q.shape[:-1], jnp.float32)
    m_run = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)

    kv = (k_q, v_q)
    n_steps = _live_ring_steps(axis_size, causal, window, shard_len)
    for step in range(n_steps):
        if step < n_steps - 1:
            kv_next = jax.tree.map(
                lambda x: lax.ppermute(x, axis_name, perm), kv
            )
        else:
            kv_next = None
        src = (idx - step) % axis_size
        if causal:
            case = jnp.int32(1) + jnp.sign(idx - src)
            o_i, lse_i = lax.switch(
                case,
                [skip_partial, causal_partial, make_past_partial(step)],
                (q, kv[0], kv[1]),
            )
        else:
            o_i, lse_i = make_past_partial(step)((q, kv[0], kv[1]))
        o_num, l_den, m_run = _merge_partial(
            o_num, l_den, m_run, o_i.astype(jnp.float32), lse_i
        )
        if kv_next is not None:
            kv = kv_next

    l_safe = jnp.where(l_den == 0.0, 1.0, l_den)
    return (o_num / l_safe[..., None]).astype(q.dtype)


def ring_attention_quantized(
    mesh,
    q, k, v,  # global [B, H, S, D], sequence sharded over the ctx axis
    *,
    kv_dtype=None,  # int8 (default) / float8_e4m3fn / float8_e5m2
                    # / "int4" (split-half packed: 8x less ICI than fp32)
    causal: bool = False,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
    window: int | None = None,
    ctx_axis: str = CTX_AXIS,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Sequence-parallel attention with QUANTIZED K/V blocks rotating over
    the ctx axis (inference/serving path — not differentiable; training uses
    `ring_attention`).  Each device quantizes its local K/V shard once
    (per-token scales), then values+scales ppermute around the ring while
    the quantized-KV kernel (fused dequant) consumes the block in front of
    it.  ICI traffic per step drops by K/V's quantization ratio."""
    from cuda_flash_attention_tpu.parallel.sharded import mesh_interpret_default
    from cuda_flash_attention_tpu.quant.qtensor import quantize_kv

    if kv_dtype is None:
        kv_dtype = jnp.int8
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    interpret = mesh_interpret_default(mesh)
    axis_size = mesh.shape[ctx_axis]
    if window is not None:
        if not causal:
            raise ValueError("ring sliding window requires causal=True")
        window = int(window)
        if window >= q.shape[2]:
            window = None  # covers the whole global sequence
    data = data_axis if data_axis in mesh.axis_names else None
    model = model_axis if model_axis in mesh.axis_names else None
    spec = P(data, model, ctx_axis, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    def _local(q, k, v):
        k_q, v_q = quantize_kv(k, v, kv_dtype)
        return _ring_quant_fwd_loop(
            q, k_q, v_q, axis_name=ctx_axis, axis_size=axis_size,
            causal=causal, sm_scale=float(sm_scale),
            compute_dtype=compute_dtype, window=window, interpret=interpret,
        )

    return _local(q, k, v)


def ring_attention(
    mesh,
    q, k, v,  # global [B, H, S, D], sequence sharded over the ctx axis
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    tile_dtype=None,
    window: int | None = None,
    ctx_axis: str = CTX_AXIS,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Sequence-parallel attention over `mesh`'s ctx axis (composable with
    data/model axes). Returns O with the same sharding as Q. Differentiable.

    ``window`` is the global sliding window (see ring_attention_local) —
    out-of-window ring rotations are skipped entirely."""
    from cuda_flash_attention_tpu.parallel.sharded import mesh_interpret_default

    interpret = mesh_interpret_default(mesh)
    axis_size = mesh.shape[ctx_axis]
    data = data_axis if data_axis in mesh.axis_names else None
    model = model_axis if model_axis in mesh.axis_names else None
    spec = P(data, model, ctx_axis, None)

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    def _local(q, k, v):
        return ring_attention_local(
            q, k, v,
            axis_name=ctx_axis, axis_size=axis_size,
            causal=causal, sm_scale=sm_scale, tile_dtype=tile_dtype,
            window=window, interpret=interpret,
        )

    return _local(q, k, v)
