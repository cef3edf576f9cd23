"""Quantized tensor container + quantize/dequantize ops.

North-star extension of the reference's SHM_PRECISION switch
(/root/reference/kernels/kernel_fa2_optimized_f16.cu stores fp16 tiles in
shared memory while HBM I/O stays fp32): here the *HBM* representation drops
to INT8 / FP8 with per-slice fp32 scales, and the dequantization is folded
into the attention kernel's matmul epilogue (see
kernels/fa2_forward_quant.py) — the tensor never exists in full precision in
HBM at all.  On TPU this attacks the actual bottleneck: HBM bandwidth
(4x fewer bytes per K/V element than fp32).

Scales are symmetric per-slice absmax:  scale = amax(|x|, axis) / qmax,
values = round(x / scale) clipped to the representable range.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

# Largest-magnitude finite value per storage dtype.
_QMAX = {
    jnp.dtype(jnp.int8): 127.0,
    jnp.dtype(jnp.float8_e4m3fn): 448.0,
    jnp.dtype(jnp.float8_e5m2): 57344.0,
}


def supported_quant_dtypes():
    return tuple(_QMAX)


def qmax_for(dtype) -> float:
    d = jnp.dtype(dtype)
    if d not in _QMAX:
        raise ValueError(
            f"unsupported quantization dtype {d}; supported: {list(_QMAX)}"
        )
    return _QMAX[d]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class QuantizedTensor:
    """values: int8/fp8 array; scales: fp32 with quantized axes reduced to 1.

    dequantized x ~= values.astype(f32) * scales  (broadcast).

    ``act_quant`` (static pytree metadata): matmuls against this tensor also
    quantize the ACTIVATIONS to int8 and contract on the native int8 MXU
    (W8A8) — the weight truly streams at 1 byte/element instead of being
    dequantized into a bf16 HBM copy (see quant/linear.py).

    ``bits=4`` (with ``group_size``): GROUP-WISE INT4 for 2D [in, out]
    weights — two 4-bit values pack per int8 byte along the IN axis
    (row 2r in the low nibble, 2r+1 in the high), scales are per
    (group_size input rows, output column): the 4-bit QLoRA base /
    checkpoint-capacity form (quant/linear.py).
    """

    values: jax.Array
    scales: jax.Array
    act_quant: bool = dataclasses.field(default=False)
    bits: int = dataclasses.field(default=8)
    group_size: int = dataclasses.field(default=0)

    @property
    def shape(self):
        if self.bits == 4:
            if self.group_size:  # packed WEIGHT: pairs along the IN axis
                return (self.values.shape[0] * 2,) + self.values.shape[1:]
            # packed KV: split-half along the LAST axis
            return self.values.shape[:-1] + (self.values.shape[-1] * 2,)
        return self.values.shape

    @property
    def ndim(self):
        # Logical rank (the packed int4 form still reports the logical
        # shape) — REQUIRED by models/lora.apply_lora's 2D-projection
        # match; without it quantized bases silently never got adapters.
        return len(self.shape)

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32):
        if self.bits == 4 and self.group_size:  # packed weight
            v = unpack_int4(self.values).astype(jnp.float32)  # [in, out]
            g = self.group_size
            w = v.reshape(v.shape[0] // g, g, v.shape[1]) * self.scales
            return w.reshape(v.shape).astype(dtype)
        if self.bits == 4:  # packed KV (split-half along the last axis)
            from cuda_flash_attention_tpu.kernels.common import (
                kv_storage_cast,
            )

            v = kv_storage_cast(
                self.values, self.values.shape[-1] * 2, jnp.float32
            )
            return (v * self.scales).astype(dtype)
        return (self.values.astype(jnp.float32) * self.scales).astype(dtype)

    def tree_flatten(self):
        return (
            (self.values, self.scales),
            (self.act_quant, self.bits, self.group_size),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        if not isinstance(aux, tuple):  # legacy aux: bare act_quant bool
            aux = (aux, 8, 0)
        return cls(*children, act_quant=aux[0], bits=aux[1],
                   group_size=aux[2])


def pack_int4(q: jax.Array) -> jax.Array:
    """[in, out] int8 values in [-8, 7] -> [in/2, out] int8 with row 2r in
    the low nibble and row 2r+1 in the high nibble."""
    lo = q[0::2] & 0xF
    hi = q[1::2] & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """Inverse of pack_int4 — sign-extended 4-bit values as int8."""
    lo = ((packed & 0xF) ^ 8) - 8          # sign-extend the low nibble
    hi = packed >> 4                        # arithmetic shift keeps sign
    n2, out = packed.shape
    return jnp.stack([lo, hi], axis=1).reshape(n2 * 2, out).astype(jnp.int8)


def quantize_int4(w: jax.Array, group_size: int = 128) -> QuantizedTensor:
    """Group-wise symmetric INT4 for a 2D [in, out] weight: scales per
    (group_size input rows, output column) — the grouping recovers most of
    the absmax headroom a single per-column scale loses at 4 bits."""
    if w.ndim != 2:
        raise ValueError(f"int4 quantization expects 2D weights; {w.shape}")
    in_dim, out = w.shape
    group_size = min(group_size, in_dim)
    if in_dim % group_size or in_dim % 2:
        raise ValueError(
            f"int4 needs group_size | in_dim and an even in_dim; got "
            f"{in_dim=} {group_size=}"
        )
    wf = w.astype(jnp.float32).reshape(in_dim // group_size, group_size, out)
    amax = jnp.max(jnp.abs(wf), axis=1, keepdims=True)  # [G, 1, out]
    scales = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / scales), -8, 7).astype(jnp.int8)
    return QuantizedTensor(
        values=pack_int4(q.reshape(in_dim, out)), scales=scales,
        bits=4, group_size=group_size,
    )


def quantize(
    x: jax.Array,
    dtype=jnp.int8,
    axis: int | Sequence[int] = -1,
) -> QuantizedTensor:
    """Symmetric absmax quantization along `axis` (reduced in the scales)."""
    qmax = qmax_for(dtype)
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    scales = jnp.maximum(amax, 1e-12) / qmax
    q = x / scales
    if jnp.dtype(dtype) == jnp.dtype(jnp.int8):
        values = jnp.clip(jnp.round(q), -qmax, qmax).astype(jnp.int8)
    else:
        values = jnp.clip(q, -qmax, qmax).astype(dtype)
    return QuantizedTensor(values=values, scales=scales)


def dequantize(qt: QuantizedTensor, dtype=jnp.float32) -> jax.Array:
    return qt.dequantize(dtype)


def pack_int4_split_half(q: jax.Array) -> jax.Array:
    """Pack int8 values in [-8, 7] two-per-byte SPLIT-HALF along the LAST
    axis: byte lane j = element j (low nibble) + element j + D/2 (high
    nibble).  The ONE shared definition of the KV packing layout — the
    kernel-side inverse is kernels/common.kv_storage_cast (two integer
    ops + one lane-concat restores exact element order)."""
    d = q.shape[-1]
    if d % 2:
        raise ValueError(f"int4 split-half packing needs an even D; {d}")
    return (
        (q[..., : d // 2] & 0xF) | (q[..., d // 2:] << 4)
    ).astype(jnp.int8)


def quantize_rows_int4(x: jax.Array):
    """Per-row (last-axis) symmetric INT4: (packed values, scales[..., 1])
    at qmax 7 — shared by the KV-cache writers and quantize_kv."""
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scales = jnp.maximum(amax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(x / scales), -8, 7).astype(jnp.int8)
    return pack_int4_split_half(q), scales


def _quantize_kv_int4(x: jax.Array) -> QuantizedTensor:
    """Per-token INT4 for [B, H, S, D] K/V (split-half packed)."""
    packed, scales = quantize_rows_int4(x)
    return QuantizedTensor(values=packed, scales=scales, bits=4)


def quantize_kv(k: jax.Array, v: jax.Array, dtype=jnp.int8):
    """Per-token (per [b, h, s] row) quantization of K and V [B, H, S, D] —
    the KV-cache layout consumed by the fused-dequant attention kernels.
    dtype "int4" packs two values per byte (split-half; 8x fewer KV bytes
    than fp32 — and 8x less ICI when these blocks rotate around the
    quantized ring)."""
    if isinstance(dtype, str) and dtype == "int4":
        return _quantize_kv_int4(k), _quantize_kv_int4(v)
    return quantize(k, dtype, axis=-1), quantize(v, dtype, axis=-1)
