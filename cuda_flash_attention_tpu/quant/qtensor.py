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
    """

    values: jax.Array
    scales: jax.Array
    act_quant: bool = dataclasses.field(default=False)

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype

    def dequantize(self, dtype=jnp.float32):
        return (self.values.astype(jnp.float32) * self.scales).astype(dtype)

    def tree_flatten(self):
        return (self.values, self.scales), self.act_quant

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, act_quant=aux)


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


def quantize_kv(k: jax.Array, v: jax.Array, dtype=jnp.int8):
    """Per-token (per [b, h, s] row) quantization of K and V [B, H, S, D] —
    the KV-cache layout consumed by the fused-dequant attention kernels."""
    return quantize(k, dtype, axis=-1), quantize(v, dtype, axis=-1)
