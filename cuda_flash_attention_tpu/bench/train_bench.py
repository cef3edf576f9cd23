"""Training throughput benchmark: flagship train-step tokens/sec/chip.

Chains optax AdamW train steps in a lax.fori_loop (state threads through, so
nothing dead-codes) and two-point-slope-times them — the model-level
companion to the kernel headline in bench.py.

Usage:
    python -m cuda_flash_attention_tpu.bench.train_bench --batch 2 --seq 2048
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.models.training import (
    init_train_state,
    make_optax_train_step,
    make_optimizer,
)
from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    init_params,
)
from cuda_flash_attention_tpu.utils.timing import sync


def measure_train_throughput(cfg: TransformerConfig, batch: int, seq: int,
                             iters: int = 8) -> dict:
    opt = make_optimizer(decay_steps=10_000)
    state = init_train_state(init_params(jax.random.PRNGKey(0), cfg), opt)
    step = make_optax_train_step(cfg, opt)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (batch, seq + 1), 0, cfg.vocab_size
    )

    @functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
    def run_n(state, tokens, n):
        def body(_, carry):
            state, loss = carry
            state, m = step(state, tokens)
            return state, m["loss"]

        return jax.lax.fori_loop(0, n, body, (state, jnp.float32(0)))

    n_lo, n_hi = iters, iters * 5
    state, loss = run_n(state, tokens, n=n_lo)
    sync(loss)
    state, loss = run_n(state, tokens, n=n_hi)
    sync(loss)
    t0 = time.perf_counter()
    state, loss = run_n(state, tokens, n=n_lo)
    sync(loss)
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    state, loss = run_n(state, tokens, n=n_hi)
    sync(loss)
    t_hi = time.perf_counter() - t0
    step_s = max(t_hi - t_lo, 1e-9) / (n_hi - n_lo)
    return {
        "train_tokens_per_sec_per_chip": batch * seq / step_s,
        "step_ms": step_s * 1e3,
        "batch": batch,
        "seq": seq,
        "loss": float(loss),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()
    cfg = (
        TransformerConfig.tiny() if args.tiny else TransformerConfig(
            vocab_size=2048, d_model=512, n_layers=4, n_heads=8, n_kv_heads=4,
            head_dim=64, d_ff=1536,
        )
    )
    print(json.dumps(measure_train_throughput(cfg, args.batch, args.seq)))


if __name__ == "__main__":
    main()
