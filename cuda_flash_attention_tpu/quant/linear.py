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

from cuda_flash_attention_tpu.quant.qtensor import QuantizedTensor, quantize


def quantize_weight(w: jax.Array, dtype=jnp.int8) -> QuantizedTensor:
    """Per-output-channel symmetric quantization of a [in, out] weight."""
    if w.ndim != 2:
        raise ValueError(f"expected 2D weight, got {w.shape}")
    return quantize(w, dtype, axis=0)  # scales [1, out]


def quantized_matmul(x: jax.Array, w_q: QuantizedTensor,
                     precision=None) -> jax.Array:
    """x @ dequant(w_q), with the scale applied after the contraction.

    Under the TPU's default (reduced-precision) matmul pass this is MORE
    accurate than multiplying a dequantized fp32 weight: int8 values are
    exactly representable in bf16, so only the activation loses bits."""
    y = jnp.dot(x, w_q.values.astype(x.dtype), precision=precision)
    return y * w_q.scales.astype(x.dtype)


def dense(x: jax.Array, w) -> jax.Array:
    """Dense matmul accepting either a plain array or a QuantizedTensor —
    the single dispatch point the model layer uses for every projection."""
    if isinstance(w, QuantizedTensor):
        return quantized_matmul(x, w)
    return x @ w.astype(x.dtype)


_QUANT_KEYS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head")


def quantize_transformer_params(params, dtype=jnp.int8, keys=_QUANT_KEYS):
    """Weight-only quantization of a transformer param pytree: all dense
    projections become QuantizedTensors; norms/embedding stay full precision
    (embedding gathers don't benefit and norm scales are tiny)."""

    def _convert(tree):
        out = {}
        for name, leaf in tree.items():
            if name == "layers":
                out[name] = [_convert(layer) for layer in leaf]
            elif name in keys and isinstance(leaf, jax.Array) and leaf.ndim == 2:
                out[name] = quantize_weight(leaf, dtype)
            else:
                out[name] = leaf
        return out

    return _convert(params)
