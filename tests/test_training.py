"""Training engine tests: optax AdamW step reduces loss, shards over the
mesh, and round-trips through orbax checkpoints."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_flash_attention_tpu.models import (
    TransformerConfig,
    forward,
    init_params,
    init_train_state,
    loss_fn,
    make_optax_train_step,
    make_optimizer,
    train_loop,
)
from cuda_flash_attention_tpu.parallel.mesh import make_device_mesh


def _data_iter(cfg, batch=2, seq=129, seed=0):
    key = jax.random.PRNGKey(seed)
    while True:
        key, sub = jax.random.split(key)
        yield jax.random.randint(sub, (batch, seq), 0, cfg.vocab_size)


def test_optax_step_reduces_loss():
    cfg = TransformerConfig.tiny()
    opt = make_optimizer(learning_rate=1e-2, warmup_steps=1, decay_steps=20)
    state = init_train_state(init_params(jax.random.PRNGKey(0), cfg), opt)
    step = jax.jit(make_optax_train_step(cfg, opt))
    tokens = next(_data_iter(cfg))
    losses = []
    for _ in range(8):
        state, metrics = step(state, tokens)  # memorize one batch
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.9, losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_train_loop_checkpoints(tmp_path):
    cfg = TransformerConfig.tiny()
    state = train_loop(
        cfg, _data_iter(cfg), num_steps=3,
        checkpoint_dir=str(tmp_path / "ck"), checkpoint_every=3, log_every=0,
    )
    assert int(state.step) == 3
    from cuda_flash_attention_tpu.utils.checkpoint import restore_checkpoint

    restored = restore_checkpoint(str(tmp_path / "ck"))
    assert int(restored["step"]) == 3


@pytest.mark.slow
def test_optax_step_sharded_matches_single():
    """The same step on a DP×TP mesh must match the unsharded step."""
    devices = jax.devices("cpu")
    if len(devices) < 4:
        pytest.skip("need 4 cpu devices")
    mesh = make_device_mesh({"data": 2, "model": 2}, devices=devices[:4])
    cfg = TransformerConfig.tiny()
    opt = make_optimizer(learning_rate=1e-3, warmup_steps=1, decay_steps=10)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = next(_data_iter(cfg, batch=4))

    state1 = init_train_state(params, opt)
    step1 = jax.jit(make_optax_train_step(cfg, opt))
    state1, m1 = step1(state1, tokens)

    from cuda_flash_attention_tpu.models import param_shardings

    params_sh = jax.tree.map(jax.device_put, params, param_shardings(mesh, cfg))
    state2 = init_train_state(params_sh, opt)
    step2 = jax.jit(make_optax_train_step(cfg, opt, mesh=mesh))
    state2, m2 = step2(state2, tokens)

    # DP psum / TP all-reduce reassociate fp32 sums vs the single-device
    # order; agreement to ~1e-4 relative proves the sharded math.
    np.testing.assert_allclose(
        float(m1["loss"]), float(m2["loss"]), rtol=2e-4
    )
    a = jax.tree.leaves(state1.params)[1]
    b = jax.tree.leaves(state2.params)[1]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.parametrize("policy", ["full", "dots"])
def test_remat_matches_no_remat(policy):
    """jax.checkpoint over the layer body must not change loss or grads —
    remat trades recompute for activation memory, never numerics (same
    ops, same order, replayed)."""
    import dataclasses

    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None
    )
    cfg_r = dataclasses.replace(cfg, remat=policy)
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jax.random.randint(
        jax.random.PRNGKey(1), (2, 64), 0, cfg.vocab_size
    )
    with jax.default_matmul_precision("highest"):
        l0, g0 = jax.value_and_grad(loss_fn)(params, tokens, cfg)
        l1, g1 = jax.value_and_grad(loss_fn)(params, tokens, cfg_r)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree.leaves(g0)
    flat1 = jax.tree.leaves(g1)
    for a, b in zip(flat0, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_remat_unknown_policy_rejected():
    import dataclasses

    cfg = dataclasses.replace(TransformerConfig.tiny(), remat="bogus")
    params = init_params(jax.random.PRNGKey(0), cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="remat"):
        forward(params, tokens, cfg)


def test_grad_accum_matches_full_batch():
    """grad_accum=2 over a B=4 batch must produce (numerically) the same
    update as the full-batch step: microbatch means average to the global
    mean, so optimizer hyperparameters stay batch-invariant."""
    import dataclasses

    from cuda_flash_attention_tpu.models.training import (
        init_train_state,
        make_optax_train_step,
        make_optimizer,
    )

    cfg = dataclasses.replace(
        TransformerConfig.tiny(), dtype=jnp.float32, attn_tile_dtype=None,
        param_dtype=jnp.float32,
    )
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(decay_steps=10)
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 128), 0,
                                cfg.vocab_size)

    s_full = init_train_state(params, opt)
    s_acc = init_train_state(params, opt)
    step_full = jax.jit(make_optax_train_step(cfg, opt))
    step_acc = jax.jit(make_optax_train_step(cfg, opt, grad_accum=2))
    s_full, m_full = step_full(s_full, tokens)
    s_acc, m_acc = step_acc(s_acc, tokens)
    assert abs(float(m_full["loss"]) - float(m_acc["loss"])) < 1e-5
    for a, b in zip(jax.tree.leaves(s_full.params),
                    jax.tree.leaves(s_acc.params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6
        )


def test_grad_accum_rejects_ragged_batch():
    from cuda_flash_attention_tpu.models.training import (
        init_train_state,
        make_optax_train_step,
        make_optimizer,
    )

    cfg = TransformerConfig.tiny()
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(decay_steps=10)
    step = make_optax_train_step(cfg, opt, grad_accum=3)
    tokens = jnp.zeros((4, 64), jnp.int32)
    with pytest.raises(AssertionError, match="microbatch"):
        step(init_train_state(params, opt), tokens)
