"""Weight-only quantization for dense layers (INT8 / FP8).

The matmul-with-dequant identity used throughout:

    x @ (W_q * scale) == (x @ W_q) * scale      (scale per output column)

so the weight streams from HBM at 1 byte/element and the dequant is one
VPU multiply on the (much smaller) activation-shaped output — XLA fuses it
into the matmul epilogue.  This is the weight analog of the KV-cache path in
kernels/fa2_forward_quant.py; no Pallas kernel is needed because XLA already
emits the fused form for this pattern.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.quant.qtensor import (
    QuantizedTensor,
    quantize,
    quantize_int4,
)


def quantize_weight(w: jax.Array, dtype=jnp.int8,
                    group_size: int = 128) -> QuantizedTensor:
    """Per-output-channel symmetric quantization of a [in, out] weight.
    dtype "int4" selects the packed group-wise 4-bit form (half an int8
    byte per element; the QLoRA-base / checkpoint-capacity format)."""
    if w.ndim != 2:
        raise ValueError(f"expected 2D weight, got {w.shape}")
    if isinstance(dtype, str) and dtype == "int4":
        return quantize_int4(w, group_size=group_size)
    return quantize(w, dtype, axis=0)  # scales [1, out]


def quantized_matmul(x: jax.Array, w_q: QuantizedTensor,
                     precision=None) -> jax.Array:
    """x @ dequant(w_q), with the scale applied after the contraction.

    Under the TPU's default (reduced-precision) matmul pass this is MORE
    accurate than multiplying a dequantized fp32 weight: int8 values are
    exactly representable in bf16, so only the activation loses bits.

    NOTE: XLA hoists the weight's astype out of serving loops, so this form
    saves memory CAPACITY but streams a bf16 weight copy (measured: base-
    model decode 1.12 -> 1.70 ms/step).  For true 1-byte weight streaming
    use act_quant=True (W8A8, below)."""
    if w_q.bits == 4:
        # Group scales ride the IN axis, so the per-output-column epilogue
        # identity does not apply: dequantize then matmul (capacity form —
        # 0.5 byte/element at rest; XLA hoists the dequant out of loops).
        return jnp.dot(x, w_q.dequantize(x.dtype), precision=precision)
    if w_q.act_quant and jnp.dtype(w_q.values.dtype) == jnp.dtype(jnp.int8):
        return w8a8_matmul(x, w_q)
    y = jnp.dot(x, w_q.values.astype(x.dtype), precision=precision)
    return y * w_q.scales.astype(x.dtype)


def w8a8_matmul(x: jax.Array, w_q: QuantizedTensor) -> jax.Array:
    """Dynamic per-row activation quantization + native int8 MXU contraction:
    y = (x_q @ w_q) * sx * sw.  The int8 weight feeds the MXU directly — no
    bf16 HBM copy — so bandwidth-bound decode streams half the bytes."""
    ax = jnp.maximum(
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True), 1e-12
    )
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * (127.0 / ax)), -127, 127
    ).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, w_q.values, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (
        y.astype(jnp.float32) * (ax / 127.0) * w_q.scales.astype(jnp.float32)
    ).astype(x.dtype)


def dense(x: jax.Array, w) -> jax.Array:
    """Dense matmul accepting a plain array, a QuantizedTensor, or a
    LoRATensor — the single dispatch point the model layer uses for every
    projection."""
    from cuda_flash_attention_tpu.models.lora import LoRATensor

    if isinstance(w, LoRATensor):
        # Frozen base: stop_gradient keeps autodiff from materializing a
        # base-sized gradient (the LoRA memory win); the low-rank delta's
        # [*, r] intermediate is tiny and XLA fuses the add.
        y = dense(x, jax.lax.stop_gradient(w.base))
        delta = (x @ w.a.astype(x.dtype)) @ w.b.astype(x.dtype)
        return y + delta * jnp.asarray(w.scale, x.dtype)
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w)
    return x @ w.astype(x.dtype)


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head")


def quantize_transformer_params(params, dtype=jnp.int8, keys=_QUANT_KEYS,
                                act_quant: bool = False):
    """Weight-only quantization of a transformer param pytree: all dense
    projections become QuantizedTensors; norms/embedding stay full precision
    (embedding gathers don't benefit and norm scales are tiny).  dtype may
    be "int4" for the packed group-wise 4-bit form."""
    if act_quant and isinstance(dtype, str) and dtype == "int4":
        raise ValueError("act_quant (W8A8) requires int8 weights")

    def _convert(tree):
        out = {}
        for name, leaf in tree.items():
            if name == "layers":
                out[name] = [_convert(layer) for layer in leaf]
            elif name in keys and isinstance(leaf, jax.Array) and leaf.ndim == 2:
                qt = quantize_weight(leaf, dtype)
                if act_quant:
                    qt = QuantizedTensor(qt.values, qt.scales, act_quant=True)
                out[name] = qt
            else:
                out[name] = leaf
        return out

    return _convert(params)
