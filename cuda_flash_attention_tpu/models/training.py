"""Production train step: optax AdamW + cosine schedule + global-norm
clipping, mesh-shardable, with orbax checkpoint integration.

The reference has no training loop (SURVEY.md §2 — kernel library only);
models/transformer.py carries a minimal SGD-momentum step for the multichip
dry run.  This module is the full-featured engine: the optimizer state is a
pytree sharded like the params (pjit partitions it automatically), so the
same step function runs single-chip or DP×TP×SP without modification.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from cuda_flash_attention_tpu.models.transformer import (
    TransformerConfig,
    loss_fn,
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array  # int32 scalar


def make_optimizer(
    learning_rate: float = 3e-4,
    warmup_steps: int = 100,
    decay_steps: int = 10_000,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
    b1: float = 0.9,
    b2: float = 0.95,
):
    import optax

    # decay_steps is the TOTAL schedule length; keep warmup strictly inside
    # it so short runs (tests, smoke loops) stay valid.
    warmup_steps = min(warmup_steps, max(decay_steps - 1, 1))
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=learning_rate,
        warmup_steps=warmup_steps, decay_steps=decay_steps,
        end_value=learning_rate * 0.1,
    )
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(schedule, b1=b1, b2=b2, weight_decay=weight_decay),
    )


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_optax_train_step(cfg: TransformerConfig, optimizer, mesh=None,
                          grad_accum: int = 1):
    """Returns step(state, tokens) -> (state, metrics). Jittable/pjittable;
    grads and optimizer update shard with the params.

    ``grad_accum`` > 1 enables gradient accumulation (microbatching): the
    leading batch dim splits into `grad_accum` microbatches scanned
    sequentially, so the EFFECTIVE batch grows `grad_accum`x at the
    activation-memory cost of one microbatch — the standard trade for
    large-batch training past HBM limits.  Gradients are MEAN-reduced over
    microbatches (loss_fn is already per-token mean), so optimizer
    hyperparameters are batch-size-invariant."""
    import optax

    def _vag(params, tokens):
        """value_and_grad tolerating INTEGER leaves (quantized QLoRA
        bases): allow_int gives them float0 tangents, which optax can't
        add — replace with typed zeros (they're frozen regardless)."""
        loss, g = jax.value_and_grad(loss_fn, allow_int=True)(
            params, tokens, cfg, mesh
        )
        g = jax.tree.map(
            lambda gi, p: (
                jnp.zeros_like(p)
                if getattr(gi, "dtype", None) == jax.dtypes.float0
                else gi
            ),
            g, params,
        )
        return loss, g

    def _grads(params, tokens):
        if grad_accum <= 1:
            return _vag(params, tokens)
        b = tokens.shape[0]
        assert b % grad_accum == 0, (
            f"batch {b} must divide into grad_accum={grad_accum} "
            "microbatches"
        )
        micro = tokens.reshape(grad_accum, b // grad_accum, *tokens.shape[1:])

        def body(carry, mb):
            loss_sum, g_acc = carry
            loss, g = _vag(params, mb)
            g_acc = jax.tree.map(
                lambda a, x: a + x.astype(jnp.float32), g_acc, g
            )
            return (loss_sum + loss, g_acc), None

        zeros = jax.tree.map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params
        )
        (loss_sum, g_sum), _ = jax.lax.scan(
            body, (jnp.float32(0.0), zeros), micro
        )
        inv = 1.0 / grad_accum
        grads = jax.tree.map(lambda g, p: (g * inv).astype(p.dtype),
                             g_sum, params)
        return loss_sum * inv, grads

    def step(state: TrainState, tokens) -> tuple[TrainState, dict]:
        loss, grads = _grads(state.params, tokens)
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        return (
            TrainState(params, opt_state, state.step + 1),
            {"loss": loss, "grad_norm": gnorm, "step": state.step + 1},
        )

    return step


def train_loop(
    cfg: TransformerConfig,
    data_iter,
    *,
    num_steps: int,
    mesh=None,
    params=None,
    optimizer=None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 0,
    log_every: int = 10,
    seed: int = 0,
):
    """Minimal host loop: jit(step) over a token iterator, periodic orbax
    checkpoints (utils/checkpoint.py), returns the final TrainState."""
    from cuda_flash_attention_tpu.models.transformer import init_params
    from cuda_flash_attention_tpu.utils.checkpoint import save_checkpoint

    if optimizer is None:
        optimizer = make_optimizer(decay_steps=max(num_steps, 2))
    if params is None:
        params = init_params(jax.random.PRNGKey(seed), cfg)
    state = init_train_state(params, optimizer)
    step_fn = jax.jit(make_optax_train_step(cfg, optimizer, mesh=mesh))

    def _check_finite(metrics):
        # Failure detection (SURVEY.md §5 — the reference's NaN/Inf gate,
        # test_flash_attention2.py:1018-1020, applied to training): abort
        # before a poisoned step contaminates the checkpoint chain.
        if not jnp.isfinite(metrics["loss"]):
            raise FloatingPointError(
                f"non-finite loss at step {int(metrics['step'])}; "
                "restore the last checkpoint to resume"
            )

    metrics = None
    for i in range(num_steps):
        tokens = next(data_iter)
        state, metrics = step_fn(state, tokens)
        # Finiteness is checked only at log/checkpoint boundaries: a
        # per-step check would force a device->host sync every iteration
        # and serialize the async dispatch pipeline.
        if log_every and (i + 1) % log_every == 0:
            _check_finite(metrics)
            print(
                f"step {int(metrics['step'])}: loss={float(metrics['loss']):.4f} "
                f"gnorm={float(metrics['grad_norm']):.3f}"
            )
        if checkpoint_dir and checkpoint_every and (i + 1) % checkpoint_every == 0:
            _check_finite(metrics)
            save_checkpoint(
                checkpoint_dir, state.params, state.opt_state,
                step=int(state.step),
            )
    if metrics is not None:
        _check_finite(metrics)
    return state
