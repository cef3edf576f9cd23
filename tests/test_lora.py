"""LoRA adapter tests: zero-init transparency, merged-vs-adapter forward
parity, frozen-base training (only a/b move), and QLoRA (int8 base)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    apply_lora,
    forward,
    init_params,
    lora_trainable_mask,
    merge_lora,
)
from cuda_flash_attention_tpu.models.lora import LoRATensor


def _cfg_params():
    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
        param_dtype=jnp.float32,
    )
    return cfg, init_params(jax.random.PRNGKey(0), cfg)


def _tokens(cfg, b=2, s=128, seed=1):
    return jax.random.randint(jax.random.PRNGKey(seed), (b, s), 0,
                              cfg.vocab_size)


def _randomize_adapters(params, seed=2):
    """Give b nonzero values so the adapters actually change the model."""
    key = jax.random.PRNGKey(seed)

    def _r(x):
        nonlocal key
        if isinstance(x, LoRATensor):
            key, sub = jax.random.split(key)
            return LoRATensor(
                x.base, x.a, 0.1 * jax.random.normal(sub, x.b.shape, x.b.dtype),
                scale=x.scale,
            )
        return x

    return jax.tree.map(
        _r, params, is_leaf=lambda x: isinstance(x, LoRATensor)
    )


@pytest.mark.quick
def test_zero_init_is_transparent():
    cfg, params = _cfg_params()
    lp = apply_lora(params, jax.random.PRNGKey(3), rank=4)
    toks = _tokens(cfg)
    np.testing.assert_array_equal(
        np.asarray(forward(lp, toks, cfg)),
        np.asarray(forward(params, toks, cfg)),
    )


def test_merged_matches_adapter_forward():
    cfg, params = _cfg_params()
    lp = _randomize_adapters(apply_lora(params, jax.random.PRNGKey(3), rank=4))
    toks = _tokens(cfg)
    out_adapter = forward(lp, toks, cfg)
    out_merged = forward(merge_lora(lp), toks, cfg)
    err = float(jnp.max(jnp.abs(out_adapter - out_merged)))
    assert err < 1e-4, err
    # ... and the adapters DO change the model (plumbing is live).
    assert float(jnp.max(jnp.abs(out_adapter - forward(params, toks, cfg)))) > 1e-3


def test_train_updates_only_adapters():
    from cuda_flash_attention_tpu.models import make_lora_optimizer
    from cuda_flash_attention_tpu.models.training import (
        init_train_state,
        make_optax_train_step,
        make_optimizer,
    )

    cfg, params = _cfg_params()
    lp = apply_lora(params, jax.random.PRNGKey(3), rank=4)
    opt = make_lora_optimizer(
        make_optimizer(warmup_steps=1, decay_steps=50), lp
    )
    state = init_train_state(lp, opt)
    step = jax.jit(make_optax_train_step(cfg, opt))
    losses = []
    for seed in range(6):
        state, metrics = step(state, _tokens(cfg, seed=1))
        losses.append(float(metrics["loss"]))
    assert all(jnp.isfinite(jnp.asarray(losses)))
    # Fine-tuning on a fixed batch must make progress through the adapters.
    assert losses[-1] < losses[0], losses

    # EVERY frozen leaf is bit-identical: bases, embed, lm_head, norms
    # (optax.masked alone would gradient-ascend embed/lm_head — the
    # make_lora_optimizer zero-first chain is load-bearing).  The
    # trainable mask is the ground truth for which leaves may move.
    mask_leaves = jax.tree.leaves(lora_trainable_mask(lp))
    moved = 0
    for trainable, x0, x1 in zip(
        mask_leaves, jax.tree.leaves(lp), jax.tree.leaves(state.params)
    ):
        same = bool(jnp.array_equal(x0, x1))
        if not trainable:
            assert same, "frozen leaf moved"
        elif not same:
            moved += 1
    assert moved > 0


def test_qlora_int8_base():
    from cuda_flash_attention_tpu.models.lora import LoRATensor
    from cuda_flash_attention_tpu.quant import quantize_transformer_params
    from cuda_flash_attention_tpu.quant.qtensor import QuantizedTensor

    cfg, params = _cfg_params()
    qp = quantize_transformer_params(params, jnp.int8)
    lp = apply_lora(qp, jax.random.PRNGKey(3), rank=4)
    # Regression: QuantizedTensor lacked .ndim, so apply_lora silently
    # skipped every quantized base — QLoRA without adapters.
    wrapped = lp["layers"][0]["wq"]
    assert isinstance(wrapped, LoRATensor)
    assert isinstance(wrapped.base, QuantizedTensor)
    lp = _randomize_adapters(lp)
    toks = _tokens(cfg)
    out = forward(lp, toks, cfg)
    assert bool(jnp.isfinite(out).all())
    # Randomized adapters actually change the forward vs the bare base.
    out_base = forward(qp, toks, cfg)
    assert float(jnp.max(jnp.abs(out - out_base))) > 1e-3
    merged = merge_lora(lp)
    # Merge keeps the int8 storage format.
    wq = merged["layers"][0]["wq"]
    assert isinstance(wq, QuantizedTensor)
    out_m = forward(merged, toks, cfg)
    # int8 requantization noise bounds the merge error.
    assert float(jnp.max(jnp.abs(out - out_m))) < 0.3


def test_qlora_quantized_base_trains():
    """QLoRA training end to end on a quantized base: integer base leaves
    get float0 tangents (allow_int), adapters move, loss decreases."""
    from cuda_flash_attention_tpu.models import make_lora_optimizer
    from cuda_flash_attention_tpu.models.lora import LoRATensor
    from cuda_flash_attention_tpu.models.training import (
        init_train_state,
        make_optax_train_step,
        make_optimizer,
    )
    from cuda_flash_attention_tpu.quant import quantize_transformer_params

    cfg, params = _cfg_params()
    qp = quantize_transformer_params(params, "int4")
    lp = apply_lora(qp, jax.random.PRNGKey(3), rank=4)
    assert isinstance(lp["layers"][0]["wq"], LoRATensor)
    opt = make_lora_optimizer(
        make_optimizer(learning_rate=1e-2, warmup_steps=1, decay_steps=100),
        lp,
    )
    state = init_train_state(lp, opt)
    step = jax.jit(make_optax_train_step(cfg, opt))
    losses = []
    for _ in range(8):
        state, metrics = step(state, _tokens(cfg, seed=1))
        losses.append(float(metrics["loss"]))
    assert all(jnp.isfinite(jnp.asarray(losses)))
    assert losses[-1] < losses[0], losses
    # Adapters moved; the packed int4 base is bit-identical.
    w0, w1 = lp["layers"][0]["wq"], state.params["layers"][0]["wq"]
    assert float(jnp.abs(w1.b - w0.b).max()) > 0.0
    assert bool(jnp.array_equal(w0.base.values, w1.base.values))
