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


def _ring_fwd_loop(q, k, v, *, axis_name, axis_size, causal, sm_scale,
                   tile_dtype, interpret):
    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def full_partial(args):
        q, k, v = args
        o, lse = flash_attention_with_lse(
            q, k, v, causal=False, sm_scale=sm_scale, tile_dtype=tile_dtype,
            interpret=interpret,
        )
        return o.astype(jnp.float32), lse  # uniform branch dtype for switch

    def causal_partial(args):
        q, k, v = args
        o, lse = flash_attention_with_lse(
            q, k, v, causal=True, sm_scale=sm_scale, tile_dtype=tile_dtype,
            interpret=interpret,
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

    for step in range(axis_size):
        # Rotate K/V for the NEXT step first so the ICI transfer overlaps
        # with this step's kernel.
        if step < axis_size - 1:
            k_next = lax.ppermute(k, axis_name, perm)
            v_next = lax.ppermute(v, axis_name, perm)
        else:
            k_next = v_next = None
        src = (idx - step) % axis_size
        if causal:
            # case 0: src > idx (future, skip); 1: diagonal; 2: past (full)
            case = jnp.int32(1) + jnp.sign(idx - src)
            o_i, lse_i = lax.switch(
                case, [skip_partial, causal_partial, full_partial], (q, k, v)
            )
        else:
            o_i, lse_i = full_partial((q, k, v))
        o_num, l_den, m_run = _merge_partial(
            o_num, l_den, m_run, o_i.astype(jnp.float32), lse_i
        )
        if k_next is not None:
            k, v = k_next, v_next

    l_safe = jnp.where(l_den == 0.0, 1.0, l_den)
    o = (o_num / l_safe[..., None]).astype(q.dtype)
    lse = jnp.where(l_den == 0.0, -jnp.inf, m_run + jnp.log(l_safe))
    return o, lse


_STATIC = (3, 4, 5, 6, 7, 8)  # axis_name..interpret


@functools.partial(jax.custom_vjp, nondiff_argnums=_STATIC)
def _ring(q, k, v, axis_name, axis_size, causal, sm_scale, tile_dtype,
          interpret):
    o, _ = _ring_fwd_loop(
        q, k, v, axis_name=axis_name, axis_size=axis_size, causal=causal,
        sm_scale=sm_scale, tile_dtype=tile_dtype, interpret=interpret,
    )
    return o


def _ring_fwd(q, k, v, axis_name, axis_size, causal, sm_scale, tile_dtype,
              interpret):
    o, lse = _ring_fwd_loop(
        q, k, v, axis_name=axis_name, axis_size=axis_size, causal=causal,
        sm_scale=sm_scale, tile_dtype=tile_dtype, interpret=interpret,
    )
    return o, (q, k, v, o, lse)


def _ring_bwd(axis_name, axis_size, causal, sm_scale, tile_dtype, interpret,
              residuals, do):
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

    def grads_step(kv, is_causal):
        if use_fused:
            # One recompute of (S, dP) per ring step yields dQ partials AND
            # the traveling dK/dV contribution (fa2_backward.py).
            dq_i, dk_i, dv_i = fa2_backward_fused_aligned(
                q_pad, kv[0], kv[1], do_pad, lse_rep, di_rep,
                causal=is_causal, block_q=bq_dkv, block_k=bk_dkv, **kw,
            )
            return dq_i, (dk_i, dv_i)
        dq_i = fa2_backward_dq_aligned(
            q_pad, kv[0], kv[1], do_pad, lse_rep, di_rep,
            causal=is_causal, block_q=bq_dkv, block_k=bk_dkv, **kw,
        )
        dk_i, dv_i = fa2_backward_dkv_aligned(
            q_pad, kv[0], kv[1], do_pad, lse_rep, di_rep,
            causal=is_causal, block_q=bq_dkv, block_k=bk_dkv, **kw,
        )
        return dq_i, (dk_i, dv_i)

    def grads_full(args):
        kv, _, _ = args
        return grads_step(kv, False)

    def grads_diag(args):
        kv, _, _ = args
        return grads_step(kv, True)

    def grads_skip(args):
        kv, _, _ = args
        return (
            jnp.zeros_like(q_pad),
            (jnp.zeros_like(kv[0]), jnp.zeros_like(kv[1])),
        )

    dq_acc = jnp.zeros_like(q_pad, dtype=jnp.float32)
    dk_acc = jnp.zeros_like(k_pad, dtype=jnp.float32)
    dv_acc = jnp.zeros_like(v_pad, dtype=jnp.float32)

    for step in range(axis_size):
        src = (idx - step) % axis_size
        if causal:
            case = jnp.int32(1) + jnp.sign(idx - src)
            dq_i, (dk_i, dv_i) = lax.switch(
                case, [grads_skip, grads_diag, grads_full],
                ((k_pad, v_pad), None, None),
            )
        else:
            dq_i, (dk_i, dv_i) = grads_full(((k_pad, v_pad), None, None))
        dq_acc += dq_i.astype(jnp.float32)
        dk_acc += dk_i.astype(jnp.float32)
        dv_acc += dv_i.astype(jnp.float32)
        # Rotate the block AND its traveling gradient accumulator; after
        # `axis_size` rotations both are back at the owning device.
        k_pad = lax.ppermute(k_pad, axis_name, perm)
        v_pad = lax.ppermute(v_pad, axis_name, perm)
        dk_acc = lax.ppermute(dk_acc, axis_name, perm)
        dv_acc = lax.ppermute(dv_acc, axis_name, perm)

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
    interpret=None,
):
    """Per-shard differentiable ring attention — call inside shard_map."""
    if sm_scale is None:
        sm_scale = 1.0 / (q.shape[-1] ** 0.5)
    return _ring(
        q, k, v, axis_name, axis_size, causal, float(sm_scale), tile_dtype,
        interpret,
    )


def _ring_quant_fwd_loop(q, k_q, v_q, *, axis_name, axis_size, causal,
                         sm_scale, compute_dtype, interpret):
    """Forward-only quantized-KV ring: the QUANTIZED blocks (values + scales)
    rotate around the ring — 4x (int8/fp8 vs fp32) less ICI traffic per step
    than the full-precision ring, the long-context serving configuration."""
    from cuda_flash_attention_tpu.kernels.fa2_forward_quant import (
        flash_attention_quantized_kv_with_lse,
    )

    idx = lax.axis_index(axis_name)
    perm = [(i, (i + 1) % axis_size) for i in range(axis_size)]

    def full_partial(args):
        q, k_q, v_q = args
        o, lse = flash_attention_quantized_kv_with_lse(
            q, k_q, v_q, causal=False, sm_scale=sm_scale,
            compute_dtype=compute_dtype, interpret=interpret,
        )
        return o.astype(jnp.float32), lse

    def causal_partial(args):
        q, k_q, v_q = args
        o, lse = flash_attention_quantized_kv_with_lse(
            q, k_q, v_q, causal=True, sm_scale=sm_scale,
            compute_dtype=compute_dtype, interpret=interpret,
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
    for step in range(axis_size):
        if step < axis_size - 1:
            kv_next = jax.tree.map(
                lambda x: lax.ppermute(x, axis_name, perm), kv
            )
        else:
            kv_next = None
        src = (idx - step) % axis_size
        if causal:
            case = jnp.int32(1) + jnp.sign(idx - src)
            o_i, lse_i = lax.switch(
                case, [skip_partial, causal_partial, full_partial],
                (q, kv[0], kv[1]),
            )
        else:
            o_i, lse_i = full_partial((q, kv[0], kv[1]))
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
    causal: bool = False,
    sm_scale: float | None = None,
    compute_dtype=jnp.bfloat16,
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
            compute_dtype=compute_dtype, interpret=interpret,
        )

    return _local(q, k, v)


def ring_attention(
    mesh,
    q, k, v,  # global [B, H, S, D], sequence sharded over the ctx axis
    *,
    causal: bool = False,
    sm_scale: float | None = None,
    tile_dtype=None,
    ctx_axis: str = CTX_AXIS,
    data_axis: str = DATA_AXIS,
    model_axis: str = MODEL_AXIS,
):
    """Sequence-parallel attention over `mesh`'s ctx axis (composable with
    data/model axes). Returns O with the same sharding as Q. Differentiable."""
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
            interpret=interpret,
        )

    return _local(q, k, v)
