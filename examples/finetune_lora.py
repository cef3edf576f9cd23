#!/usr/bin/env python3
"""4-bit QLoRA fine-tuning example: int4 base weights + trained adapters,
then merged back for zero-overhead serving.

    python examples/finetune_lora.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    apply_lora,
    init_params,
    make_lora_optimizer,
    merge_lora,
)
from cuda_flash_attention_tpu.models.training import (
    init_train_state,
    make_optax_train_step,
    make_optimizer,
)
from cuda_flash_attention_tpu.quant import quantize_transformer_params


def main():
    cfg = TransformerConfig(
        vocab_size=512, d_model=128, n_layers=2, n_heads=4, n_kv_heads=2,
        head_dim=32, d_ff=256,
    )
    base = init_params(jax.random.PRNGKey(0), cfg)

    # 4-bit base (group-wise packed int4) + rank-8 adapters; the LoRA
    # optimizer zero-masks every frozen leaf, so only a/b train.
    qbase = quantize_transformer_params(base, "int4")
    params = apply_lora(qbase, jax.random.PRNGKey(1), rank=8)
    opt = make_lora_optimizer(
        make_optimizer(learning_rate=1e-3, warmup_steps=1, decay_steps=50),
        params,
    )
    state = init_train_state(params, opt)
    step = jax.jit(make_optax_train_step(cfg, opt))

    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, cfg.vocab_size, (4, 65)),
        jnp.int32,
    )
    for i in range(5):
        state, metrics = step(state, tokens)
        print(f"step {i}: loss {float(metrics['loss']):.4f}")

    served = merge_lora(state.params)  # int4 base, adapters folded in
    print("merged wq is",
          type(served["layers"][0]["wq"]).__name__,
          f"bits={served['layers'][0]['wq'].bits}")


if __name__ == "__main__":
    main()
