"""LoRA: low-rank adapters for parameter-efficient fine-tuning.

No reference counterpart (the reference is a kernel library); this is the
production fine-tuning path a serving/training framework is expected to
carry.  TPU-first design notes:

  * An adapter-carrying weight is a PYTREE NODE (`LoRATensor`) consumed by
    the same `quant.linear.dense` dispatch every projection already goes
    through — the transformer/decode/pipeline code paths are untouched, and
    adapters compose with weight quantization (QLoRA: int8/fp8 frozen base
    + fp32 adapters) because `base` may itself be a QuantizedTensor.
  * The frozen base passes through `lax.stop_gradient` inside the matmul,
    so autodiff never materializes base-sized gradients/optimizer moments —
    the memory win LoRA exists for.  Pair the optimizer with
    `optax.masked(opt, lora_trainable_mask(params))` so weight decay
    cannot touch the frozen weights either.
  * y = x @ base + ((x @ A) @ B) * (alpha / rank): two skinny matmuls whose
    [*, r] intermediate is tiny; XLA fuses the add into the epilogue.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

_DEFAULT_TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class LoRATensor:
    """base (frozen; array or QuantizedTensor) + trainable (a [in, r],
    b [r, out]); effective weight = base + (a @ b) * scale."""

    base: Any
    a: jax.Array
    b: jax.Array
    scale: float = 1.0  # alpha / rank — static pytree metadata

    @property
    def shape(self):
        return self.base.shape

    def tree_flatten(self):
        return (self.base, self.a, self.b), self.scale

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, scale=aux)


def _wrap(key, w, rank: int, alpha: float, dtype):
    d_in, d_out = w.shape
    a = jax.random.normal(key, (d_in, rank), dtype) / jnp.sqrt(
        jnp.asarray(d_in, dtype)
    )
    b = jnp.zeros((rank, d_out), dtype)  # delta starts at EXACTLY zero
    return LoRATensor(w, a, b, scale=float(alpha) / rank)


def apply_lora(params, key, *, rank: int = 8, alpha: float | None = None,
               targets=_DEFAULT_TARGETS, adapter_dtype=jnp.float32):
    """Wrap every target 2-D projection (top level + per layer) in a
    LoRATensor.  b starts at zero, so the wrapped model is EXACTLY the base
    model until training moves the adapters."""
    if alpha is None:
        alpha = float(rank)

    def _convert(tree, key):
        out = {}
        for name, leaf in sorted(tree.items()):
            if name == "layers":
                layers = []
                for layer in leaf:
                    key, sub = jax.random.split(key)
                    layers.append(_convert(layer, sub))
                out[name] = layers
            elif name in targets and getattr(leaf, "ndim", 0) == 2:
                key, sub = jax.random.split(key)
                out[name] = _wrap(sub, leaf, rank, alpha, adapter_dtype)
            else:
                out[name] = leaf
        return out

    return _convert(params, key)


def lora_trainable_mask(params):
    """Boolean pytree (same structure) marking ONLY adapter leaves a/b as
    trainable.

    NOTE: `optax.masked(opt, mask)` alone is NOT a freeze — optax passes
    masked-out leaves' updates through UNCHANGED (i.e. the raw gradient),
    which silently gradient-ASCENDS every frozen-but-grad-carrying leaf
    (embeddings, norms, lm_head).  Use `make_lora_optimizer`, which zeroes
    frozen updates first."""
    def _mask(x):
        if isinstance(x, LoRATensor):
            base_mask = jax.tree.map(lambda _: False, x.base)
            return LoRATensor(base_mask, True, True, scale=x.scale)
        return jax.tree.map(lambda _: False, x)

    return jax.tree.map(
        _mask, params, is_leaf=lambda x: isinstance(x, LoRATensor)
    )


def make_lora_optimizer(inner, params):
    """Wrap an optax optimizer so it trains ONLY the LoRA adapters: frozen
    leaves' updates are set to zero (optax.masked alone passes them through
    as raw gradients — see lora_trainable_mask), then `inner` runs on the
    adapters.  Optimizer state is allocated for adapter leaves only."""
    import optax

    mask = lora_trainable_mask(params)
    inverse = jax.tree.map(lambda m: not m, mask)
    return optax.chain(
        optax.masked(optax.set_to_zero(), inverse),
        optax.masked(inner, mask),
    )


def merge_lora(params):
    """Fold adapters into the base weights (serving form: zero runtime
    overhead).  A QuantizedTensor base dequantizes, merges, and requantizes
    at the same storage dtype."""
    from cuda_flash_attention_tpu.quant.linear import quantize_weight
    from cuda_flash_attention_tpu.quant.qtensor import QuantizedTensor

    def _merge(x):
        if not isinstance(x, LoRATensor):
            return x
        delta = (
            x.a.astype(jnp.float32) @ x.b.astype(jnp.float32)
        ) * x.scale
        if isinstance(x.base, QuantizedTensor):
            merged = x.base.dequantize(jnp.float32) + delta
            if x.base.bits == 4:  # packed int4: requantize group-wise
                return quantize_weight(
                    merged, "int4", group_size=x.base.group_size
                )
            return quantize_weight(merged, x.base.values.dtype)
        return (x.base.astype(jnp.float32) + delta).astype(x.base.dtype)

    return jax.tree.map(
        _merge, params, is_leaf=lambda x: isinstance(x, LoRATensor)
    )
